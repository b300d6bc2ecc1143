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


def actor_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds for stateful ``map_batches`` stages:
    ``(1, cpus - 2)``. The -2 headroom keeps the pool from covering every
    session CPU, which starves downstream exchange operators (observed
    deadlock-ish stall on a 4-cpu test session with a fixed full-width
    pool); the autoscaler only grows the pool while upstream blocks queue,
    so small inputs stay at 1-2 actors."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, cpus - 2))
