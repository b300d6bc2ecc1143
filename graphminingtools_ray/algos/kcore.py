"""Distributed k-core decomposition via synchronous peeling.

Semantics (Seidman 1983 / Matula–Beck): the k-core is the maximal subgraph
in which every vertex has degree >= k; computed by repeatedly deleting
vertices whose degree within the surviving subgraph is < k until none
qualify. The alive set shrinks monotonically, so synchronous rounds reach
the same fixpoint as sequential peeling and the result is order-free.

Same co-partitioned superstep harness as PageRank / CC / LPA
(algos.partitioned): state = int64 alive flag per vertex; per pinned 2D-grid
cell block, per-dst count of ALIVE srcs (``np.bincount`` — the combiner; the
exchange carries sub-edge-scale count panels exactly like PageRank's
contribution panels, int64 instead of float); per-partition update
``alive' = alive AND (alive_degree >= k)`` + changed-count scalar. Converges
when no vertex dies in a round (<= peel-depth supersteps). All math is exact
integer counting, so determinism is structural.

Reference: the reference has no k-core executable; this is a north-star-
adjacent link-graph operator (same family as connectedComponents.c /
the LPA verb) added for the 100-TB link-graph surface. The SQL oracle in
__ray_entry__ unrolls the peel rounds (peeling is idempotent at the
fixpoint, so any unroll >= the data's peel depth is exact).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .partitioned import (
    PartitionedCheckpoint,
    build_partitioned_graph,
    flatten_panel_group,
    init_state,
    unpack_panel_layout,
    state_to_arrays,
    state_to_dataset,
    unpack_part_block,
    _row_lists,
)


@ray.remote
def _alive_count_cell(block: pa.Table, layout: pa.Table, h: dict,
                      out_parts: list[int]):
    """MAP side (see pagerank._contrib_cell for the exchange contract):
    per-dst count of alive srcs within the cell, one panel table per dst
    part present (multi-return, driver-side ref routing)."""
    cache: dict[int, np.ndarray] = {}
    by_part = {p: ([], [], []) for p in out_parts}
    for row in range(block.num_rows):
        part, srcs, src_index, dst_unique, dst_index, _ = unpack_part_block(
            block, row
        )
        src_pos, panel_parts, offsets, dst_local = unpack_panel_layout(
            layout, row
        )
        if not len(panel_parts):
            continue
        if part not in cache:
            vref, vrow = h["state"][part]
            (alive_p,) = _row_lists(ray.get(vref), vrow, ["values"])
            cache[part] = alive_p.astype(np.float64)
        alive = cache[part]
        per_edge = alive[src_pos][src_index]
        # counts are bounded by the 4M-edge cell size, exact in float64
        partial = np.bincount(
            dst_index, weights=per_edge, minlength=len(dst_local)
        ).astype(np.int64)
        block_id = int(block["block_id"][row].as_py())
        bids, dl, pl = by_part[int(panel_parts[0])]
        bids.append(block_id)
        dl.append(dst_local)
        pl.append(partial)
    out = []
    for p in out_parts:
        bids, dl, pl = by_part[p]
        out.append(pa.table(
            {
                "block_id": pa.array(bids, pa.int64()),
                "dst": pa.array(dl, pa.list_(pa.int32())),
                "partial": pa.array(pl, pa.list_(pa.int64())),
            }
        ))
    return out[0] if len(out) == 1 else tuple(out)


@ray.remote(num_returns=2)
def _peel_part(h: dict, part: int, k: int, iteration: int, ckpt_tmp, digest,
               *panels: pa.Table):
    """REDUCE side: sum this part's alive-degree panels (order-free exact
    int64 adds) and kill vertices below k. Emits (state row, died-count)."""
    sref, srow = h["static"][part]
    (ids_p,) = _row_lists(ray.get(sref), srow, ["ids"])
    vref, vrow = h["state"][part]
    (alive_old,) = _row_lists(ray.get(vref), vrow, ["values"])
    deg = np.zeros(len(alive_old), dtype=np.int64)
    if panels:
        t = pa.concat_tables(panels)
        dst_local, partial = flatten_panel_group(t)
        if len(dst_local):
            np.add.at(deg, dst_local, partial)
    new_alive = np.where((alive_old > 0) & (deg >= k), 1, 0).astype(np.int64)
    died = int(np.count_nonzero(new_alive != alive_old))
    if ckpt_tmp is not None:
        PartitionedCheckpoint.write_shard(
            ckpt_tmp, iteration, part, digest, ids_p, new_alive
        )
    row_table = pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "values": pa.array([new_alive], pa.list_(pa.int64())),
        }
    )
    return row_table, died


def k_core_partitioned(
    edges_symmetric: rd.Dataset,
    k: int = 3,
    max_iter: int = 200,
    num_state_partitions: int = 8,
    checkpoint_dir: str | None = None,
):
    """Core loop. -> (state_ds, graph, info). State stays distributed;
    state value 1 = in the k-core, 0 = peeled. ``edges_symmetric`` must
    contain both half-edges (graph.symmetrize). With ``checkpoint_dir``,
    per-partition shards + lineage manifests land per superstep (same
    PartitionedCheckpoint contract as CC/LPA/PageRank) and a re-run with
    the same graph digest resumes from the last committed round."""
    g = build_partitioned_graph(edges_symmetric, P=num_state_partitions)
    if g.n_vertices == 0:
        return None, g, {"iterations": 0, "supersteps": []}

    ckpt = (
        PartitionedCheckpoint(checkpoint_dir, g.digest)
        if checkpoint_dir is not None
        else None
    )
    start_iter = 0
    resumed_from = None
    state_ds = state_index = None
    if ckpt is not None:
        latest = ckpt.latest_meta()
        if latest is not None:
            it, manifest = latest
            meta = manifest.get("meta", {})
            if "k" in meta and int(meta["k"]) != int(k):
                raise ValueError(
                    f"checkpoint at this dir is for k={meta['k']}, not "
                    f"k={k}: the digest covers the graph only — use a "
                    "different checkpoint_dir per k"
                )
            state_ds, state_index = ckpt.load_state(g, it, pa.int64())
            start_iter = it + 1
            resumed_from = it
            if meta.get("converged"):
                return state_ds, g, {
                    "iterations": it + 1,
                    "converged": True,
                    "resumed_from": it,
                    "supersteps": [],
                }
    if state_ds is None:
        state_ds, state_index, _ = init_state(
            g, lambda part, ids, outdeg: np.ones(len(ids), np.int64),
            pa.int64()
        )
    supersteps = []
    converged = False
    parts_sorted = list(g.parts)
    row_refs: dict = {}
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        handles_ref = ray.put({"static": g.static_index,
                               "state": state_index})
        tmp = ckpt.tmp_dir(it) if ckpt is not None else None
        panel_refs: dict[int, list] = {p: [] for p in parts_sorted}
        for bref, lref, dst_parts, _bid in g.panel_blocks:
            refs = _alive_count_cell.options(
                num_returns=len(dst_parts)
            ).remote(bref, lref, handles_ref, dst_parts)
            if len(dst_parts) == 1:
                refs = [refs]
            for p, r in zip(dst_parts, refs):
                panel_refs[p].append(r)
        row_refs, died_refs = {}, {}
        for p in parts_sorted:
            row_refs[p], died_refs[p] = _peel_part.remote(
                handles_ref, p, k, it, tmp, g.digest, *panel_refs[p]
            )
        died = int(sum(ray.get([died_refs[p] for p in parts_sorted])))
        state_index = {p: (row_refs[p], 0) for p in parts_sorted}
        dt = time.perf_counter() - t0
        supersteps.append({"iteration": it, "seconds": dt, "died": died})
        converged = died == 0
        if ckpt is not None:
            ckpt.commit(
                it, parts_sorted,
                meta={"died": died, "converged": converged, "k": k,
                      "seconds": dt, "n_edges": g.n_edges},
            )
        if converged:
            break

    if row_refs:
        state_ds = rd.from_arrow_refs([row_refs[p] for p in parts_sorted])
    info = {
        "iterations": len(supersteps) + start_iter,
        "converged": converged,
        "resumed_from": resumed_from,
        "supersteps": supersteps,
    }
    return state_ds, g, info


def k_core(
    edges_symmetric: rd.Dataset,
    k: int = 3,
    max_iter: int = 200,
    num_state_partitions: int = 8,
    checkpoint_dir: str | None = None,
):
    """-> (vertex_ids, in_core 0/1 flags, info) — numpy result delivery."""
    state_ds, g, info = k_core_partitioned(
        edges_symmetric, k, max_iter, num_state_partitions, checkpoint_dir
    )
    if state_ds is None:
        return np.empty(0, np.int64), np.empty(0, np.int64), info
    ids, flags = state_to_arrays(state_ds, g)
    return ids, flags.astype(np.int64), info


def k_core_dataset(edges_symmetric: rd.Dataset, **kw):
    """Streaming result: Dataset of (vertex_id, in_core 0/1)."""
    state_ds, g, info = k_core_partitioned(edges_symmetric, **kw)
    if state_ds is None:
        return rd.from_arrow(
            pa.table({"vertex_id": pa.array([], pa.int64()),
                      "in_core": pa.array([], pa.int64())})
        ), info
    return state_to_dataset(state_ds, g, "in_core"), info
