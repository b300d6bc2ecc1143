"""Distributed PageRank power iteration (north-star op; absent from the
reference — semantics fixed by BASELINE.json: damping 0.85, dangling-mass
redistribution, L∞ < 1e-6 stop; oracle = NumPy power iteration in tests).

Superstep shape (round-2 co-partitioned plan — algos.partitioned):

    state_p (per-partition rank rows, object store; driver holds refs only)
      → map_batches over PINNED per-src-part CSR blocks: each task reads
        ONLY its partition's rank/outdeg slice (1/P of the vector, zero-copy
        shared memory), computes per-edge rank[src]/outdeg[src],
        pre-aggregated per dst WITHIN the block (np.bincount — the combiner)
      → groupby("part") keyed on part(dst)       # the ONE exchange
      → per-partition update task: rank' = (1-d)/N + d·(contrib + dangling/N)
        in canonical order (bit-deterministic), per-part delta + dangling
        partials, per-part checkpoint shard with lineage
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

from ..functions.bucketing import int_bucket
from .partitioned import (
    PartitionedCheckpoint,
    build_partitioned_graph,
    init_state,
    index_state,
    state_to_arrays,
    state_to_dataset,
    unpack_part_block,
    _row_lists,
)

_SENTINEL = -1


def _make_contrib_fn(handles_ref, weighted: bool, P: int):
    def contrib(batch: pa.Table) -> pa.Table:
        h = ray.get(handles_ref)
        cache: dict[int, tuple] = {}
        parts_out, keys, partials = [], [], []
        for row in range(batch.num_rows):
            part, srcs, src_index, dst_unique, dst_index, w = unpack_part_block(
                batch, row
            )
            if part not in cache:
                sref, srow = h["static"][part]
                ids_p, outdeg_p = _row_lists(ray.get(sref), srow, ["ids", "outdeg"])
                vref, vrow = h["state"][part]
                (rank_p,) = _row_lists(ray.get(vref), vrow, ["values"])
                dangling = outdeg_p == 0.0
                coef = rank_p / np.where(dangling, 1.0, outdeg_p)
                coef[dangling] = 0.0
                cache[part] = (ids_p, coef)
            ids_p, coef = cache[part]
            per_edge = coef[np.searchsorted(ids_p, srcs)][src_index]
            if weighted:
                per_edge = per_edge * w
            partial = np.bincount(
                dst_index, weights=per_edge, minlength=len(dst_unique)
            )
            parts_out.append(int_bucket(dst_unique, P))
            keys.append(dst_unique)
            partials.append(partial)
        if not keys:
            return pa.table(
                {"part": np.empty(0, np.int64), "dst": np.empty(0, np.int64),
                 "partial": np.empty(0, np.float64)}
            )
        return pa.table(
            {
                "part": np.concatenate(parts_out),
                "dst": np.concatenate(keys),
                "partial": np.concatenate(partials),
            }
        )

    return contrib


def _make_update_fn(handles_ref, damping, n, dangling_mass, iteration,
                    ckpt_tmp, digest):
    def update(t: pa.Table) -> pa.Table:
        h = ray.get(handles_ref)
        part = int(t["part"][0].as_py())
        sref, srow = h["static"][part]
        ids_p, outdeg_p = _row_lists(ray.get(sref), srow, ["ids", "outdeg"])
        vref, vrow = h["state"][part]
        (rank_old,) = _row_lists(ray.get(vref), vrow, ["values"])
        dst = t["dst"].to_numpy()
        partial = t["partial"].to_numpy()
        m = dst != _SENTINEL
        dst, partial = dst[m], partial[m]
        incoming = np.zeros(len(ids_p), dtype=np.float64)
        if len(dst):
            # canonical accumulation order → bit-deterministic float sums
            order = np.lexsort((partial, dst))
            np.add.at(
                incoming, np.searchsorted(ids_p, dst[order]), partial[order]
            )
        new_rank = (1.0 - damping) / n + damping * (incoming + dangling_mass / n)
        delta = float(np.max(np.abs(new_rank - rank_old))) if len(ids_p) else 0.0
        dangling_partial = float(new_rank[outdeg_p == 0.0].sum())
        if ckpt_tmp is not None:
            PartitionedCheckpoint.write_shard(
                ckpt_tmp, iteration, part, digest, ids_p, new_rank
            )
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "values": pa.array([new_rank], pa.list_(pa.float64())),
                "delta": pa.array([delta], pa.float64()),
                "dangling_partial": pa.array([dangling_partial], pa.float64()),
            }
        )

    return update


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

    seed = g.seed_messages(pa.float64())
    supersteps = []
    converged = False
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        handles_ref = ray.put({"static": g.static_index, "state": state_index})
        contribs = g.blocks.map_batches(
            _make_contrib_fn(handles_ref, weighted, g.P), batch_format="pyarrow"
        )
        tmp = ckpt.tmp_dir(it) if ckpt is not None else None
        new_state = (
            contribs.union(seed)
            .groupby("part")
            .map_groups(
                _make_update_fn(
                    handles_ref, damping, n, dangling_mass, it, tmp, g.digest
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        state_index, scalars = index_state(
            new_state, ["delta", "dangling_partial"]
        )
        state_ds = new_state
        parts_sorted = sorted(scalars)
        delta = max(scalars[p]["delta"] for p in parts_sorted)
        dangling_mass = sum(scalars[p]["dangling_partial"] for p in parts_sorted)
        converged = delta < tol
        dt = time.perf_counter() - t0
        supersteps.append(
            {
                "iteration": it,
                "seconds": dt,
                "delta_inf": delta,
                "edges_per_sec": g.n_edges / dt if dt > 0 else float("inf"),
            }
        )
        if ckpt is not None:
            ckpt.commit(
                it,
                parts_sorted,
                meta={
                    "delta_inf": delta,
                    "converged": converged,
                    "dangling_mass": dangling_mass,
                },
            )
        if converged:
            break

    info = {
        "iterations": (supersteps[-1]["iteration"] + 1) if supersteps else start_iter,
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
