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
