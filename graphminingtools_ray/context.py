"""Ray Data execution-context defaults for this engine.

Central place to quiet progress bars and set block sizing so tests, bench and
the driver all run with the same knobs. Never calls ``ray.init``.
"""

from __future__ import annotations


def configure(target_max_block_size: int | None = None) -> None:
    """Apply engine-wide DataContext defaults (idempotent, cheap)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # Row order is never part of our contract (SURVEY §2.9): keyed determinism only.
    ctx.execution_options.preserve_order = False
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
