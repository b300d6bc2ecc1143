"""graphminingtools_ray — a Ray-Data-native link-graph & data-processing engine.

Re-expresses the query semantics of the reference suite (pwelke/GraphMiningTools,
see SURVEY.md) over Ray Data: one giant edge table instead of a stream of small
graphs, shuffle-based fixpoint iterations (PageRank / connected components /
label propagation) instead of single-machine DFS, and vectorized Arrow batch
kernels instead of per-graph C loops.

Layout
------
- ``sources``   : deterministic corpus generator + table readers (SURVEY §2.1)
- ``functions`` : scalar/vector functions — hashing, rounding (SURVEY §2.8)
- ``graph``     : edge derivation, superstep framework, partitioning (SURVEY §4)
- ``algos``     : PageRank, components, WL/LPA, triangles (SURVEY §2.11)
- ``stages``    : stateful map_batches stages — text, dedup, ANN, media (§2.3)
- ``pipelines`` : end-to-end query callables over an sf_dir (driver contract)
- ``state``     : per-superstep checkpoint/lineage + resume (SURVEY §4)

No module in this package calls ``ray.init()`` — the driver owns the session.
"""

__version__ = "0.1.0"


def _disable_numpy_thp_madvise() -> None:
    """Turn off numpy's MADV_HUGEPAGE hint on large allocations.

    numpy (>=1.18) madvises transparent huge pages for big buffers; on
    virtualized hosts with demand-paged guest memory a 2 MiB THP fault is
    serviced orders of magnitude slower than 4 KiB faults (measured here:
    first-touch 0.05 GB/s with the hint vs 1.1 GB/s without, per process).
    Every vectorized kernel in this package allocates fresh large arrays in
    short-lived Ray workers, so the hint dominates wall time. numpy's public
    switch is the ``NUMPY_MADVISE_HUGEPAGE`` env var (read at import), with a
    runtime toggle for the already-imported case. Running at import time here
    means every Ray worker that unpickles one of our functions applies it
    before the first kernel runs.
    """
    import os

    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    try:
        try:
            from numpy._core import multiarray as _ma  # numpy >= 2
        except ImportError:
            from numpy.core import multiarray as _ma  # numpy 1.x
        _ma._set_madvise_hugepage(False)
    except Exception:
        pass


_disable_numpy_thp_madvise()
