"""Distributed PageRank power iteration (north-star op; absent from the
reference — semantics fixed by BASELINE.json: damping 0.85, dangling-mass
redistribution, L∞ < 1e-6 stop; oracle = NumPy power iteration in tests).

Superstep shape (SURVEY §4 physical plan):

    rank_i (broadcast, aligned to sorted vertex ids)
      → map_batches over adjacency blocks: per-edge contribution
        rank[src]/outdeg[src], pre-aggregated per dst WITHIN the block
        (np.bincount — the combiner; hub in-degree skew collapses to
        ≤ #blocks rows per dst before the shuffle)
      → groupby("dst").aggregate(Sum)          # the exchange, keyed by dst
      → driver: rank' = (1-d)/N + d·(contrib + dangling/N); L∞ test
      → checkpoint iter i (hash-partitioned parquet + lineage manifest)

Float64 state throughout (1e-6 convergence is not reachable in float32,
SURVEY §7.4).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.bucketing import bucketed_group_combine, sum_by_int_key
from ..graph.csr import build_csr_blocks, unpack_block
from ..state.checkpoint import CheckpointManager
from .common import block_summary, broadcast_state


def _make_contrib_fn(ids_ref, coef_ref, weighted: bool):
    def contrib(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        coef = ray.get(coef_ref)
        keys, partials = [], []
        for row in range(batch.num_rows):
            srcs, src_index, dst_unique, dst_index, w = unpack_block(batch, row)
            per_edge = coef[np.searchsorted(ids, srcs)][src_index]
            if weighted:
                per_edge = per_edge * w
            partial = np.bincount(
                dst_index, weights=per_edge, minlength=len(dst_unique)
            )
            keys.append(dst_unique)
            partials.append(partial)
        if not keys:
            return pa.table(
                {"dst": np.empty(0, np.int64), "partial": np.empty(0, np.float64)}
            )
        return pa.table(
            {"dst": np.concatenate(keys), "partial": np.concatenate(partials)}
        )

    return contrib


def pagerank(
    edges: rd.Dataset,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    num_state_partitions: int = 8,
):
    """-> (vertex_ids: np.ndarray, ranks: np.ndarray, info: dict).

    ``info`` carries per-superstep metrics (wall seconds, edges/s) and the
    resume provenance — the BENCH/BASELINE headline numbers come from here.
    """
    blocks = build_csr_blocks(edges)
    # single setup pass: ids + out-degrees + edge count + lineage digest
    ids, outdeg, n_edges, digest = block_summary(blocks, weighted=weighted)
    n = len(ids)
    if n == 0:
        return ids, np.empty(0, np.float64), {"iterations": 0, "supersteps": []}
    dangling = outdeg == 0.0

    mgr = None
    start_iter = 0
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    resumed_from = None
    if checkpoint_dir is not None:
        mgr = CheckpointManager(
            checkpoint_dir, digest, num_partitions=num_state_partitions
        )
        latest = mgr.load_latest()
        if latest is not None:
            it, ck_ids, ck_vals, meta = latest
            if len(ck_ids) == n and np.array_equal(ck_ids, ids):
                rank = ck_vals.astype(np.float64)
                start_iter = it + 1
                resumed_from = it
                if meta.get("converged"):
                    return ids, rank, {
                        "iterations": it + 1,
                        "resumed_from": it,
                        "supersteps": [],
                        "n_vertices": n,
                        "n_edges": n_edges,
                    }

    safe_out = np.where(dangling, 1.0, outdeg)
    supersteps = []
    converged = False
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        coef = rank / safe_out
        coef[dangling] = 0.0
        ids_ref, coef_ref = broadcast_state(ids, coef)
        contribs = blocks.map_batches(
            _make_contrib_fn(ids_ref, coef_ref, weighted), batch_format="pyarrow"
        )
        # hash-partitioned exchange keyed on dst + vectorized per-bucket sum
        agg = bucketed_group_combine(
            contribs, ["dst"], sum_by_int_key("dst", "partial", "dst", "contrib")
        )
        incoming = np.zeros(n, dtype=np.float64)
        for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
            idx = np.searchsorted(ids, b["dst"].to_numpy())
            incoming[idx] = b["contrib"].to_numpy()
        dangling_mass = float(rank[dangling].sum())
        new_rank = (1.0 - damping) / n + damping * (incoming + dangling_mass / n)
        delta = float(np.max(np.abs(new_rank - rank)))
        rank = new_rank
        dt = time.perf_counter() - t0
        supersteps.append(
            {
                "iteration": it,
                "seconds": dt,
                "delta_inf": delta,
                "edges_per_sec": n_edges / dt if dt > 0 else float("inf"),
            }
        )
        converged = delta < tol
        if mgr is not None:
            mgr.save(
                it, ids, rank, meta={"delta_inf": delta, "converged": converged}
            )
        if converged:
            break

    info = {
        "iterations": (supersteps[-1]["iteration"] + 1) if supersteps else start_iter,
        "converged": converged,
        "resumed_from": resumed_from,
        "n_vertices": n,
        "n_edges": n_edges,
        "supersteps": supersteps,
    }
    return ids, rank, info
