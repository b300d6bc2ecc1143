"""Distributed PageRank power iteration (north-star op; absent from the
reference — semantics fixed by BASELINE.json: damping 0.85, dangling-mass
redistribution, L∞ < 1e-6 stop; oracle = NumPy power iteration in tests).

Superstep shape (round-2 co-partitioned plan — algos.partitioned):

    state_p (per-partition rank rows, object store; driver holds refs only)
      → contrib task per pinned 2D-grid cell block (part(src) x part(dst)):
        reads ONLY its src partition's rank/outdeg slice (1/P of the vector,
        zero-copy shared memory), per-edge rank[src]/outdeg[src]
        pre-aggregated per dst WITHIN the cell (np.bincount — the combiner;
        exchange entries are bounded by P*V*(1-e^{-E/PV}), sub-edge-scale)
      → hand-scheduled hash shuffle keyed on part(dst): each cell's panel
        targets ONE dst part (baked at build), so the driver routes contrib
        output REFS straight to update tasks — plasma-direct, no sort
      → per-partition update task: rank' = (1-d)/N + d·(contrib + dangling/N)
        with panels flattened in canonical block_id order
        (bit-deterministic), per-part delta + dangling partials, per-part
        checkpoint shard with lineage
      → driver: max(delta_p) L∞ test + manifest commit (scalars only)

Float64 state throughout (1e-6 convergence is not reachable in float32,
SURVEY §7.4). Nothing vertex- or edge-scale is ever materialized on the
driver inside the loop; ``state_to_arrays`` pulls the final vector once for
numpy-returning callers (tests / driver queries) and ``pagerank_dataset``
returns the streaming (vertex_id, rank) view for the 100-TB path.
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
    flatten_float_panels,
    init_state,
    unpack_panel_layout,
    state_to_arrays,
    state_to_dataset,
    unpack_part_block,
    _row_lists,
)

_SENTINEL = -1


@ray.remote
def _contrib_cell(block: pa.Table, layout: pa.Table, h: dict, weighted: bool,
                  out_parts: list[int]):
    """MAP side of the hand-scheduled shuffle: a block of grid-cell CSR rows
    → one panel table PER dst part in ``out_parts`` (multi-return; the
    driver routes each return ref to its part's update task). ``h`` arrives
    as the deref'd handles dict; the (ref, row) tuples inside stay refs and
    are read zero-copy from the local object store."""
    cache: dict[int, np.ndarray] = {}
    by_part = {p: ([], [], []) for p in out_parts}
    for row in range(block.num_rows):
        part, srcs, src_index, dst_unique, dst_index, w = unpack_part_block(
            block, row
        )
        src_pos, panel_parts, offsets, dst_local = unpack_panel_layout(
            layout, row
        )
        if not len(panel_parts):
            continue
        block_id = int(block["block_id"][row].as_py())
        if part not in cache:
            sref, srow = h["static"][part]
            (outdeg_p,) = _row_lists(ray.get(sref), srow, ["outdeg"])
            vref, vrow = h["state"][part]
            (rank_p,) = _row_lists(ray.get(vref), vrow, ["values"])
            dangling = outdeg_p == 0.0
            coef = rank_p / np.where(dangling, 1.0, outdeg_p)
            coef[dangling] = 0.0
            cache[part] = coef
        coef = cache[part]
        per_edge = coef[src_pos][src_index]
        if weighted and w is not None:
            per_edge = per_edge * w
        partial = np.bincount(
            dst_index, weights=per_edge, minlength=len(dst_local)
        )
        dst_part = int(panel_parts[0])
        bids, dl, pl = by_part[dst_part]
        bids.append(block_id)
        n_j = h["n_by_part"][dst_part]
        if len(dst_local) * 2 >= n_j:
            # DENSE panel (deterministic rule): cell coverage is saturated,
            # so ship the full per-part vector — drops the int32 index
            # column and turns the update into a pure vector add. Marked by
            # an empty dst list + partial length == n_j.
            vec = np.zeros(n_j, dtype=np.float64)
            vec[dst_local] = partial  # positions are unique
            dl.append(dst_local[:0])
            pl.append(vec)
        else:
            dl.append(dst_local)
            pl.append(partial)
    out = []
    for p in out_parts:
        bids, dl, pl = by_part[p]
        out.append(pa.table(
            {
                "block_id": pa.array(bids, pa.int64()),
                "dst": pa.array(dl, pa.list_(pa.int32())),
                "partial": pa.array(pl, pa.list_(pa.float64())),
            }
        ))
    return out[0] if len(out) == 1 else tuple(out)


@ray.remote(num_returns=2)
def _update_part(h: dict, part: int, damping: float, n: int,
                 dangling_mass, iteration: int, ckpt_tmp, digest,
                 n_panels: int, *refs):
    """REDUCE side: pulls exactly its part's panels (plasma-direct), flattens
    them in canonical block_id order (bit-deterministic float accumulation;
    dst entries are precomputed int32 positions in this part's inventory)
    and emits (state row, scalars).

    ``dangling_mass`` is either a float (first iteration of a run) or None,
    in which case the PREVIOUS iteration's per-part scalar dicts follow the
    panels in ``refs`` (sorted-part order) and the mass is reduced here —
    this keeps the superstep chain a pure Ray DAG with no driver barrier,
    so consecutive supersteps pipeline."""
    panels = refs[:n_panels]
    if dangling_mass is None:
        dangling_mass = sum(d["dangling_partial"] for d in refs[n_panels:])
    sref, srow = h["static"][part]
    ids_p, outdeg_p = _row_lists(ray.get(sref), srow, ["ids", "outdeg"])
    vref, vrow = h["state"][part]
    (rank_old,) = _row_lists(ray.get(vref), vrow, ["values"])
    incoming = flatten_float_panels(panels, len(ids_p))
    new_rank = (1.0 - damping) / n + damping * (incoming + dangling_mass / n)
    delta = float(np.max(np.abs(new_rank - rank_old))) if len(ids_p) else 0.0
    dangling_partial = float(new_rank[outdeg_p == 0.0].sum())
    if ckpt_tmp is not None:
        PartitionedCheckpoint.write_shard(
            ckpt_tmp, iteration, part, digest, ids_p, new_rank
        )
    row_table = pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "values": pa.array([new_rank], pa.list_(pa.float64())),
        }
    )
    return row_table, {"delta": delta, "dangling_partial": dangling_partial}


def pagerank_partitioned(
    edges: rd.Dataset,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    num_state_partitions: int = 8,
    graph=None,
):
    """Core loop. -> (state_ds, graph, info). State stays distributed.
    ``graph`` lets callers reuse a prebuilt PartitionedGraph (e.g. shared
    with WL over the same edge view)."""
    g = graph if graph is not None else build_partitioned_graph(
        edges, P=num_state_partitions, weighted=weighted
    )
    n = g.n_vertices
    info_base = {"n_vertices": n, "n_edges": g.n_edges}
    if n == 0:
        return None, g, {"iterations": 0, "supersteps": [], **info_base}

    ckpt = (
        PartitionedCheckpoint(checkpoint_dir, g.digest)
        if checkpoint_dir is not None
        else None
    )
    start_iter = 0
    resumed_from = None
    dangling_mass = g.n_dangling / n  # uniform initial rank 1/n
    state_ds = state_index = None
    if ckpt is not None:
        latest = ckpt.latest_meta()
        if latest is not None:
            it, manifest = latest
            meta = manifest.get("meta", {})
            state_ds, state_index = ckpt.load_state(g, it)
            start_iter = it + 1
            resumed_from = it
            dangling_mass = float(meta["dangling_mass"])
            if meta.get("converged"):
                return state_ds, g, {
                    "iterations": it + 1,
                    "converged": True,
                    "resumed_from": it,
                    "supersteps": [],
                    **info_base,
                }
    if state_ds is None:
        state_ds, state_index, _ = init_state(
            g, lambda part, ids, outdeg: np.full(len(ids), 1.0 / n)
        )

    supersteps = []
    converged = False
    parts_sorted = list(g.parts)
    n_by_part = {p: int(g.static_scalars[p]["n"]) for p in parts_sorted}
    contrib_by_k: dict = {}  # options(num_returns=k) wrappers, built once

    def submit_superstep(it: int, state_idx: dict, dm, prev_scals):
        """One superstep as pure DAG nodes: contribs over the pinned cell
        blocks → per-part updates. ``dm`` is a float only for the first
        submitted iteration; afterwards None + prev scalar refs (the update
        tasks reduce the dangling mass themselves, so consecutive
        supersteps pipeline without a driver barrier)."""
        handles_ref = ray.put({"static": g.static_index, "state": state_idx,
                               "n_by_part": n_by_part})
        tmp = ckpt.tmp_dir(it) if ckpt is not None else None
        # hand-scheduled hash shuffle keyed on part(dst): contrib outputs
        # are pre-routed (one dst part per grid cell), so the driver passes
        # refs straight to the update tasks — no sort exchange
        panel_refs: dict[int, list] = {p: [] for p in parts_sorted}
        for bref, lref, dst_parts, _bid in g.panel_blocks:
            k = len(dst_parts)
            if k not in contrib_by_k:
                contrib_by_k[k] = _contrib_cell.options(num_returns=k)
            refs = contrib_by_k[k].remote(bref, lref, handles_ref, weighted,
                                          dst_parts)
            if len(dst_parts) == 1:
                refs = [refs]
            for p, r in zip(dst_parts, refs):
                panel_refs[p].append(r)
        extra = [] if dm is not None else [prev_scals[p] for p in parts_sorted]
        row_refs, scal_refs = {}, {}
        for p in parts_sorted:
            row_refs[p], scal_refs[p] = _update_part.remote(
                handles_ref, p, damping, n, dm, it, tmp, g.digest,
                len(panel_refs[p]), *panel_refs[p], *extra,
            )
        return row_refs, scal_refs

    # pipelined loop: submit iteration k+1 before checking iteration k's
    # convergence, so the inter-superstep driver latency (ray.put + task
    # submission + scalar gather) overlaps with cluster work. At most one
    # speculative superstep runs past convergence; its output is discarded.
    import os as _os

    LOOKAHEAD = int(_os.environ.get("GRAFT_PR_LOOKAHEAD", "0"))
    row_hist: dict[int, dict] = {}
    scal_hist: dict[int, dict] = {}
    t_start = time.perf_counter()
    t_prev = t_start
    converged_at = None
    next_submit = start_iter
    next_check = start_iter
    dm_arg = dangling_mass
    prev_scals = None
    while True:
        while (next_submit < max_iter and converged_at is None
               and next_submit - next_check <= LOOKAHEAD):
            state_idx = (state_index if next_submit == start_iter
                         else {p: (row_hist[next_submit - 1][p], 0)
                               for p in parts_sorted})
            rr, sr = submit_superstep(next_submit, state_idx, dm_arg, prev_scals)
            row_hist[next_submit] = rr
            scal_hist[next_submit] = sr
            dm_arg, prev_scals = None, sr
            next_submit += 1
        if next_check >= next_submit:
            break
        it = next_check
        scalars = dict(zip(parts_sorted,
                           ray.get([scal_hist[it][p] for p in parts_sorted])))
        delta = max(scalars[p]["delta"] for p in parts_sorted)
        dmass = sum(scalars[p]["dangling_partial"] for p in parts_sorted)
        now = time.perf_counter()
        dt = now - t_prev
        t_prev = now
        supersteps.append(
            {
                "iteration": it,
                "seconds": dt,
                "delta_inf": delta,
                "edges_per_sec": g.n_edges / dt if dt > 0 else float("inf"),
            }
        )
        if ckpt is not None:
            # lineage carries the superstep metrics too (SURVEY §4: wall
            # time + edges processed logged to the lineage record)
            ckpt.commit(
                it, parts_sorted,
                meta={"delta_inf": delta, "converged": delta < tol,
                      "dangling_mass": dmass, "seconds": dt,
                      "edges_per_sec": g.n_edges / dt if dt > 0 else None,
                      "n_edges": g.n_edges},
            )
        next_check += 1
        if delta < tol:
            # stop here: the one speculative in-flight superstep is simply
            # never checked or committed (its shards get no manifest)
            converged_at = it
            break

    converged = converged_at is not None
    final_it = converged_at if converged else (next_submit - 1 if row_hist else None)
    if final_it is not None:
        final_rows = row_hist[final_it]
        state_index = {p: (final_rows[p], 0) for p in parts_sorted}
        # zero-copy Dataset view over the per-part state rows (result
        # delivery); refs stay pinned by the ds
        state_ds = rd.from_arrow_refs([final_rows[p] for p in parts_sorted])
        supersteps = [s for s in supersteps if s["iteration"] <= final_it]
    info = {
        "iterations": (final_it + 1) if final_it is not None else start_iter,
        "converged": converged,
        "resumed_from": resumed_from,
        "supersteps": supersteps,
        **info_base,
    }
    return state_ds, g, info


def pagerank(
    edges: rd.Dataset,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    num_state_partitions: int = 8,
    graph=None,
):
    """-> (vertex_ids: np.ndarray, ranks: np.ndarray, info: dict).

    numpy-returning wrapper (tests / driver queries): runs the distributed
    loop, then pulls the final vector ONCE (result delivery). ``info``
    carries per-superstep metrics (wall seconds, edges/s) and resume
    provenance — the BENCH/BASELINE headline numbers come from here.
    """
    state_ds, g, info = pagerank_partitioned(
        edges, damping, tol, max_iter, weighted, checkpoint_dir,
        num_state_partitions, graph=graph,
    )
    if state_ds is None:
        return np.empty(0, np.int64), np.empty(0, np.float64), info
    ids, ranks = state_to_arrays(state_ds, g)
    return ids, ranks, info


def pagerank_dataset(edges: rd.Dataset, **kw) -> tuple[rd.Dataset, dict]:
    """Streaming result: Dataset of (vertex_id, rank) — the at-scale API."""
    state_ds, g, info = pagerank_partitioned(edges, **kw)
    if state_ds is None:
        return rd.from_arrow(
            pa.table({"vertex_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())})
        ), info
    return state_to_dataset(state_ds, g, "rank"), info
