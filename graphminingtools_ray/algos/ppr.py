"""Personalized PageRank (seed-restart power iteration).

Same superstep substrate and contribution panels as global PageRank
(algos.pagerank — the contrib cell is teleport-agnostic, so it is reused
verbatim); only the per-partition update rule changes:

    rank' = (1-d)·t + d·incoming

with t the seed-restart distribution (uniform over the seed set instead of
uniform over all vertices — Page et al. 1999 §6 personalization). The input
must be a symmetrized (dangling-free) edge view — enforced loudly, since
dangling mass would otherwise need a seed-outdeg lookup at iteration 0.
Seeds
ship to every update task as a tiny array (broadcast-small side); each
part computes its teleport slice locally with np.isin — nothing
vertex-scale crosses the driver.

Fixed-k iteration (tol=0) keeps the arithmetic SQL-expressible for the
driver gate (same contract as graph_queries.pagerank_query).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .pagerank import _contrib_cell
from .partitioned import (
    build_partitioned_graph,
    flatten_float_panels,
    init_state,
    state_to_arrays,
    _row_lists,
)


@ray.remote
def _ppr_update_part(h: dict, part: int, damping: float, seeds: np.ndarray,
                     n_panels: int, *refs):
    """REDUCE side: canonical block_id-order flatten (bit-deterministic
    float accumulation, same dense/sparse panel families as
    pagerank._update_part) + the seed-restart update rule."""
    panels = refs[:n_panels]
    sref, srow = h["static"][part]
    ids_p, outdeg_p = _row_lists(ray.get(sref), srow, ["ids", "outdeg"])
    incoming = flatten_float_panels(panels, len(ids_p))
    tele = np.isin(ids_p, seeds).astype(np.float64) / float(len(seeds))
    new_rank = (1.0 - damping) * tele + damping * incoming
    return pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "values": pa.array([new_rank], pa.list_(pa.float64())),
        }
    )


def personalized_pagerank(
    edges: rd.Dataset,
    seeds: np.ndarray,
    damping: float = 0.85,
    k: int = 5,
    num_state_partitions: int = 8,
):
    """-> (vertex_ids, ranks, info): exactly ``k`` seed-restart power
    supersteps from r0 = uniform-over-seeds. ``edges`` must be symmetrized
    (graph.symmetrize); ``seeds`` is a small int64 array of vertex ids."""
    seeds = np.asarray(sorted(int(s) for s in seeds), np.int64)
    g = build_partitioned_graph(edges, P=num_state_partitions)
    if g.n_vertices == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), {
            "iterations": 0, "supersteps": []}
    if g.n_dangling:
        # the iteration-0 dangling mass would need a seed-outdeg lookup;
        # a symmetrized edge view (the documented input) has no dangling
        # vertices, so fail loudly instead of silently dropping mass
        raise ValueError(
            "personalized_pagerank requires a dangling-free (symmetrized) "
            f"edge view; graph has {g.n_dangling} dangling vertices"
        )

    state_ds, state_index, _ = init_state(
        g,
        lambda part, ids, outdeg: np.isin(ids, seeds).astype(np.float64)
        / float(len(seeds)),
    )
    parts_sorted = list(g.parts)
    n_by_part = {p: int(g.static_scalars[p]["n"]) for p in parts_sorted}
    supersteps = []
    row_refs: dict = {}
    for it in range(k):
        t0 = time.perf_counter()
        handles_ref = ray.put({"static": g.static_index,
                               "state": state_index,
                               "n_by_part": n_by_part})
        panel_refs: dict[int, list] = {p: [] for p in parts_sorted}
        for bref, lref, dst_parts, _bid in g.panel_blocks:
            refs = _contrib_cell.options(num_returns=len(dst_parts)).remote(
                bref, lref, handles_ref, False, dst_parts
            )
            if len(dst_parts) == 1:
                refs = [refs]
            for p, r in zip(dst_parts, refs):
                panel_refs[p].append(r)
        row_refs = {}
        for p in parts_sorted:
            row_refs[p] = _ppr_update_part.remote(
                handles_ref, p, damping, seeds,
                len(panel_refs[p]), *panel_refs[p],
            )
        state_index = {p: (row_refs[p], 0) for p in parts_sorted}
        supersteps.append({"iteration": it,
                           "seconds": time.perf_counter() - t0})

    state_ds = rd.from_arrow_refs([row_refs[p] for p in parts_sorted])
    ids, ranks = state_to_arrays(state_ds, g)
    info = {"iterations": len(supersteps), "seeds": seeds.tolist(),
            "supersteps": supersteps}
    return ids, ranks, info
