"""Distributed single-source shortest hop distances (BFS levels).

Min-plus relaxation on the unit-weight graph: dist' = min(dist,
min_{(u,v)∈E} dist(u)+1), from INF everywhere except the source. The same
min-lattice superstep shape as connected components (algos.components) —
per pinned 2D-grid cell block a block-local min-plus closure (one global
superstep hops every chain visible within the cell), then per-dst partial
mins cross the exchange as panels, per-partition update merges by min.
Exact int64 lattice ops make the fixpoint order-free and deterministic;
convergence in <= eccentricity(source) supersteps (fewer with the local
closure).

Reference: the reference computes BFS/DFS within single small graphs
(graph.c traversal helpers); this is the cross-partition single-BIG-graph
variant the link-graph tier needs (frontier expansion over a partitioned
edge set). The SQL oracle in __ray_entry__ unrolls the relaxation rounds
(idempotent at the fixpoint, so a fixed unroll >= the true eccentricity is
exact).
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

_INF = np.iinfo(np.int64).max // 4  # headroom so dist+1 never overflows


@ray.remote
def _relax_cell(block: pa.Table, layout: pa.Table, h: dict,
                out_parts: list[int], local_closure_passes: int = 64):
    """MAP side: block-local min-plus closure, then per-dst partial dist
    panels (one per dst part, multi-return for driver-side ref routing)."""
    cache: dict[int, tuple] = {}
    by_part = {p: ([], [], []) for p in out_parts}
    for row in range(block.num_rows):
        part, srcs, src_index, dst_unique, dst_index, _ = unpack_part_block(
            block, row
        )
        _sp, panel_parts, offsets, dst_local = unpack_panel_layout(
            layout, row
        )
        if not len(panel_parts):
            continue
        if part not in cache:
            sref, srow = h["static"][part]
            (ids_p,) = _row_lists(ray.get(sref), srow, ["ids"])
            vref, vrow = h["state"][part]
            (dist_p,) = _row_lists(ray.get(vref), vrow, ["values"])
            cache[part] = (ids_p, dist_p)
        ids_p, dist_p = cache[part]
        local_ids = np.union1d(srcs, dst_unique)
        d = np.full(len(local_ids), _INF, dtype=np.int64)
        pos_known = np.searchsorted(ids_p, local_ids)
        pos_known = np.minimum(pos_known, len(ids_p) - 1)
        known = ids_p[pos_known] == local_ids
        d[known] = dist_p[pos_known[known]]
        sp = np.searchsorted(local_ids, srcs)[src_index]
        dp = np.searchsorted(local_ids, dst_unique)[dst_index]
        for _ in range(local_closure_passes):
            before = d.copy()
            np.minimum.at(d, dp, d[sp] + 1)
            if np.array_equal(before, d):
                break
        partial = d[np.searchsorted(local_ids, dst_unique)]
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
def _min_dist_part(h: dict, part: int, iteration: int, ckpt_tmp, digest,
                   *panels: pa.Table):
    """REDUCE side: min-merge this part's distance panels (order-free exact
    int64 min-lattice); emits (state row, changed-count scalar)."""
    sref, srow = h["static"][part]
    (ids_p,) = _row_lists(ray.get(sref), srow, ["ids"])
    vref, vrow = h["state"][part]
    (dist_old,) = _row_lists(ray.get(vref), vrow, ["values"])
    new_dist = dist_old.copy()
    if panels:
        t = pa.concat_tables(panels)
        dst_local, partial = flatten_panel_group(t)
        if len(dst_local):
            np.minimum.at(new_dist, dst_local, partial)
    changed = int(np.count_nonzero(new_dist != dist_old))
    if ckpt_tmp is not None:
        PartitionedCheckpoint.write_shard(
            ckpt_tmp, iteration, part, digest, ids_p, new_dist
        )
    row_table = pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "values": pa.array([new_dist], pa.list_(pa.int64())),
        }
    )
    return row_table, changed


def sssp_hops_partitioned(
    edges_symmetric: rd.Dataset,
    source: int | None = None,
    max_iter: int = 200,
    num_state_partitions: int = 8,
    graph=None,
    checkpoint_dir: str | None = None,
):
    """Core loop. -> (state_ds, graph, info). State stays distributed
    (int64 dist, _INF = unreached). ``source=None`` uses the minimum vertex
    id (distributed scalar aggregate). ``edges_symmetric`` must contain
    both half-edges (graph.symmetrize). ``graph`` reuses a prebuilt
    PartitionedGraph (multi-source callers build once, relax per seed).
    With ``checkpoint_dir``: per-partition distance shards + lineage per
    superstep, digest-keyed resume (the CC/LPA/PageRank contract); the
    digest covers the graph only, so checkpoints of different SOURCES must
    use different directories."""
    if source is None:
        source = int(edges_symmetric.min("src"))
    g = graph if graph is not None else build_partitioned_graph(
        edges_symmetric, P=num_state_partitions)
    if g.n_vertices == 0:
        return None, g, {"iterations": 0, "supersteps": [],
                         "source": int(source)}

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
            if "source" in meta and int(meta["source"]) != int(source):
                raise ValueError(
                    f"checkpoint at this dir is for source {meta['source']}"
                    f", not {source}: the digest covers the graph only — "
                    "use a different checkpoint_dir per source"
                )
            state_ds, state_index = ckpt.load_state(g, it, pa.int64())
            start_iter = it + 1
            resumed_from = it
            if meta.get("converged"):
                return state_ds, g, {
                    "iterations": it + 1,
                    "converged": True,
                    "resumed_from": it,
                    "source": int(source),
                    "supersteps": [],
                }
    if state_ds is None:
        state_ds, state_index, _ = init_state(
            g,
            lambda part, ids, outdeg: np.where(
                ids == source, 0, _INF).astype(np.int64),
            pa.int64(),
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
            refs = _relax_cell.options(num_returns=len(dst_parts)).remote(
                bref, lref, handles_ref, dst_parts
            )
            if len(dst_parts) == 1:
                refs = [refs]
            for p, r in zip(dst_parts, refs):
                panel_refs[p].append(r)
        row_refs, chg_refs = {}, {}
        for p in parts_sorted:
            row_refs[p], chg_refs[p] = _min_dist_part.remote(
                handles_ref, p, it, tmp, g.digest, *panel_refs[p]
            )
        changed = int(sum(ray.get([chg_refs[p] for p in parts_sorted])))
        state_index = {p: (row_refs[p], 0) for p in parts_sorted}
        dt = time.perf_counter() - t0
        supersteps.append({"iteration": it, "seconds": dt,
                           "changed": changed})
        converged = changed == 0
        if ckpt is not None:
            ckpt.commit(
                it, parts_sorted,
                meta={"changed": changed, "converged": converged,
                      "source": int(source), "seconds": dt,
                      "n_edges": g.n_edges},
            )
        if converged:
            break

    if row_refs:
        state_ds = rd.from_arrow_refs([row_refs[p] for p in parts_sorted])
    info = {"iterations": len(supersteps) + start_iter,
            "converged": converged, "resumed_from": resumed_from,
            "source": int(source), "supersteps": supersteps}
    return state_ds, g, info


def sssp_hops(
    edges_symmetric: rd.Dataset,
    source: int | None = None,
    max_iter: int = 200,
    num_state_partitions: int = 8,
    checkpoint_dir: str | None = None,
):
    """-> (vertex_ids, hop distances with -1 for unreachable, info) —
    numpy result delivery over the distributed loop."""
    state_ds, g, info = sssp_hops_partitioned(
        edges_symmetric, source, max_iter, num_state_partitions,
        checkpoint_dir=checkpoint_dir,
    )
    if state_ds is None:
        return np.empty(0, np.int64), np.empty(0, np.int64), info
    ids, dist = state_to_arrays(state_ds, g)
    dist = dist.astype(np.int64)
    dist[dist >= _INF] = -1
    return ids, dist, info


def sssp_hops_dataset(edges_symmetric: rd.Dataset,
                      source: int | None = None, **kw):
    """Streaming result: Dataset of (vertex_id, hops) with -1 for
    unreachable — the at-scale API (the -1 remap runs inside map_batches,
    nothing vertex-scale on the driver)."""
    state_ds, g, info = sssp_hops_partitioned(edges_symmetric, source, **kw)
    if state_ds is None:
        return rd.from_arrow(
            pa.table({"vertex_id": pa.array([], pa.int64()),
                      "hops": pa.array([], pa.int64())})
        ), info
    ds = state_to_dataset(state_ds, g, "hops")

    def remap(t: pa.Table) -> pa.Table:
        h = t["hops"].to_numpy(zero_copy_only=False).copy()
        h[h >= _INF] = -1
        return pa.table({"vertex_id": t["vertex_id"], "hops": h})

    return ds.map_batches(remap, batch_format="pyarrow"), info
