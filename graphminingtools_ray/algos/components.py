"""Distributed connected components via min-label propagation.

Reference semantics: exact component partitions, ids normalized so every
vertex carries the minimum vertex id of its component — the order-independent
stand-in for the reference's DFS marking order
(``/root/reference/listComponents.c:306-319``; ``connectedComponents.c:41-68``
keeps isolated vertices as their own component, which we honor via the
optional ``all_vertex_ids`` argument since edge tables cannot mention
edge-less vertices).

Same co-partitioned superstep harness as PageRank (algos.partitioned) with
Sum → Min: per pinned 2D-grid cell block, block-local min closure then
partial min of incoming labels per dst (``np.minimum.at`` — the combiner),
ONE hand-scheduled hash shuffle keyed on part(dst) (cell panels are
pre-routed at build; driver passes refs, no sort exchange), per-partition
update ``label' = min(label, incoming)`` + changed-count scalar. Converges
when no label changes (≤ diameter supersteps on the symmetrized edge view —
pass edges through ``graph.symmetrize`` first). All label math is exact
int64, so determinism is structural.
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

_SENTINEL = -1
_IMAX = np.iinfo(np.int64).max


@ray.remote
def _min_cell(block: pa.Table, layout: pa.Table, h: dict,
              out_parts: list[int], local_closure_passes: int = 64):
    """MAP side (see pagerank._contrib_cell for the exchange contract):
    block-local min closure, then one panel table per dst part present,
    returned via multi-return for driver-side ref routing."""
    cache: dict[int, tuple] = {}
    by_part = {p: ([], [], []) for p in out_parts}
    for row in range(block.num_rows):
        part, srcs, src_index, dst_unique, dst_index, _ = unpack_part_block(
            block, row
        )
        _sp, panel_parts, offsets, dst_local = unpack_panel_layout(layout, row)
        if not len(panel_parts):
            continue
        if part not in cache:
            sref, srow = h["static"][part]
            (ids_p,) = _row_lists(ray.get(sref), srow, ["ids"])
            vref, vrow = h["state"][part]
            (labels_p,) = _row_lists(ray.get(vref), vrow, ["values"])
            cache[part] = (ids_p, labels_p)
        ids_p, labels_p = cache[part]
        # BLOCK-LOCAL MIN CLOSURE: iterate min-propagation over this
        # block's edges to a local fixpoint before emitting, so one global
        # superstep hops an entire chain that is visible within the cell.
        # Deterministic: pure min-lattice ops.
        local_ids = np.union1d(srcs, dst_unique)
        lab = np.full(len(local_ids), _IMAX, dtype=np.int64)
        pos_known = np.searchsorted(ids_p, local_ids)
        pos_known = np.minimum(pos_known, len(ids_p) - 1)
        known = ids_p[pos_known] == local_ids
        lab[known] = labels_p[pos_known[known]]
        # a vertex's own id is an upper bound on its component label
        lab = np.minimum(lab, local_ids)
        sp = np.searchsorted(local_ids, srcs)[src_index]
        dp = np.searchsorted(local_ids, dst_unique)[dst_index]
        for _ in range(local_closure_passes):
            before = lab.copy()
            np.minimum.at(lab, dp, lab[sp])
            if np.array_equal(before, lab):
                break
        # message per dst = its post-closure local label (min over all
        # incoming paths seen by this block, incl. the dst's own bound)
        partial = lab[np.searchsorted(local_ids, dst_unique)]
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
def _update_part(h: dict, part: int, iteration: int, ckpt_tmp, digest,
                 *panels: pa.Table):
    """REDUCE side: min-merge this part's panels (order-free: exact int64
    min-lattice) and emit (state row, changed-count scalar)."""
    sref, srow = h["static"][part]
    (ids_p,) = _row_lists(ray.get(sref), srow, ["ids"])
    vref, vrow = h["state"][part]
    (labels_old,) = _row_lists(ray.get(vref), vrow, ["values"])
    new_labels = labels_old.copy()
    if panels:
        t = pa.concat_tables(panels)
        dst_local, partial = flatten_panel_group(t)
        if len(dst_local):
            np.minimum.at(new_labels, dst_local, partial)
    changed = int(np.count_nonzero(new_labels != labels_old))
    if ckpt_tmp is not None:
        PartitionedCheckpoint.write_shard(
            ckpt_tmp, iteration, part, digest, ids_p, new_labels
        )
    row_table = pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "values": pa.array([new_labels], pa.list_(pa.int64())),
        }
    )
    return row_table, changed

def connected_components_partitioned(
    edges_symmetric: rd.Dataset,
    all_vertex_ids: np.ndarray | None = None,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    num_state_partitions: int = 8,
):
    """Core loop. -> (state_ds, graph, info). State stays distributed."""
    g = build_partitioned_graph(
        edges_symmetric, P=num_state_partitions, extra_vertex_ids=all_vertex_ids
    )
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
            g, lambda part, ids, outdeg: ids.copy(), pa.int64()
        )

    supersteps = []
    converged = False
    parts_sorted = list(g.parts)
    row_refs: dict = {}
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        handles_ref = ray.put({"static": g.static_index, "state": state_index})
        tmp = ckpt.tmp_dir(it) if ckpt is not None else None
        panel_refs: dict[int, list] = {p: [] for p in parts_sorted}
        for bref, lref, dst_parts, _bid in g.panel_blocks:
            refs = _min_cell.options(num_returns=len(dst_parts)).remote(
                bref, lref, handles_ref, dst_parts
            )
            if len(dst_parts) == 1:
                refs = [refs]
            for p, r in zip(dst_parts, refs):
                panel_refs[p].append(r)
        row_refs, chg_refs = {}, {}
        for p in parts_sorted:
            row_refs[p], chg_refs[p] = _update_part.remote(
                handles_ref, p, it, tmp, g.digest, *panel_refs[p]
            )
        changed_per_part = ray.get([chg_refs[p] for p in parts_sorted])
        state_index = {p: (row_refs[p], 0) for p in parts_sorted}
        state_ds = None
        changed = int(sum(changed_per_part))
        converged = changed == 0
        dt = time.perf_counter() - t0
        supersteps.append({"iteration": it, "seconds": dt, "changed": changed})
        if ckpt is not None:
            ckpt.commit(
                it, parts_sorted,
                meta={"changed": changed, "converged": converged,
                      "seconds": dt, "n_edges": g.n_edges},
            )
        if converged:
            break

    if state_ds is None and row_refs:
        state_ds = rd.from_arrow_refs([row_refs[p] for p in parts_sorted])
    info = {
        "iterations": len(supersteps) + start_iter,
        "converged": converged,
        "resumed_from": resumed_from,
        "supersteps": supersteps,
    }
    return state_ds, g, info


def connected_components(
    edges_symmetric: rd.Dataset,
    all_vertex_ids: np.ndarray | None = None,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    num_state_partitions: int = 8,
):
    """-> (vertex_ids, component_ids, info) — numpy result delivery over the
    distributed loop. ``edges_symmetric`` must contain both half-edges (see
    ``graph.symmetrize``)."""
    state_ds, g, info = connected_components_partitioned(
        edges_symmetric, all_vertex_ids, max_iter, checkpoint_dir,
        num_state_partitions,
    )
    if state_ds is None:
        return np.empty(0, np.int64), np.empty(0, np.int64), info
    ids, labels = state_to_arrays(state_ds, g)
    return ids, labels.astype(np.int64), info


def connected_components_dataset(edges_symmetric: rd.Dataset, **kw):
    """Streaming result: Dataset of (vertex_id, component_id)."""
    state_ds, g, info = connected_components_partitioned(edges_symmetric, **kw)
    if state_ds is None:
        return rd.from_arrow(
            pa.table({"vertex_id": pa.array([], pa.int64()),
                      "component_id": pa.array([], pa.int64())})
        ), info
    return state_to_dataset(state_ds, g, "component_id"), info
