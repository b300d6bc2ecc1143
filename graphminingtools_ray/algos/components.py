"""Distributed connected components via min-label propagation.

Reference semantics: exact component partitions, ids normalized so every
vertex carries the minimum vertex id of its component — the order-independent
stand-in for the reference's DFS marking order
(``/root/reference/listComponents.c:306-319``; ``connectedComponents.c:41-68``
keeps isolated vertices as their own component, which we honor via the
optional ``all_vertex_ids`` argument since edge tables cannot mention
edge-less vertices).

Same superstep harness as PageRank with Sum → Min: per block, partial min of
incoming labels per dst (``np.minimum.at`` — the combiner), then
``groupby(dst).aggregate(Min)``, then ``label' = min(label, incoming)``.
Converges when no label changes (≤ diameter supersteps on the symmetrized
edge view — pass edges through ``graph.symmetrize`` first).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.bucketing import bucketed_group_combine, min_by_int_key
from ..graph.csr import build_csr_blocks, unpack_block
from ..state.checkpoint import CheckpointManager
from .common import block_summary, broadcast_state


def _make_min_fn(ids_ref, labels_ref):
    def step(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        labels = ray.get(labels_ref)
        keys, partials = [], []
        for row in range(batch.num_rows):
            srcs, src_index, dst_unique, dst_index, _ = unpack_block(batch, row)
            per_edge = labels[np.searchsorted(ids, srcs)][src_index]
            partial = np.full(len(dst_unique), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(partial, dst_index, per_edge)
            keys.append(dst_unique)
            partials.append(partial)
        if not keys:
            return pa.table(
                {"dst": np.empty(0, np.int64), "partial": np.empty(0, np.int64)}
            )
        return pa.table(
            {"dst": np.concatenate(keys), "partial": np.concatenate(partials)}
        )

    return step


def connected_components(
    edges_symmetric: rd.Dataset,
    all_vertex_ids: np.ndarray | None = None,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    num_state_partitions: int = 8,
):
    """-> (vertex_ids, component_ids, info). ``edges_symmetric`` must contain
    both half-edges (see ``graph.symmetrize``)."""
    blocks = build_csr_blocks(edges_symmetric)
    ids, _, _, digest = block_summary(blocks)
    if all_vertex_ids is not None:
        ids = np.union1d(ids, np.asarray(all_vertex_ids, dtype=np.int64))
    n = len(ids)
    if n == 0:
        return ids, np.empty(0, np.int64), {"iterations": 0, "supersteps": []}

    labels = ids.copy()
    mgr = None
    start_iter = 0
    resumed_from = None
    if checkpoint_dir is not None:
        mgr = CheckpointManager(
            checkpoint_dir, digest, num_partitions=num_state_partitions
        )
        latest = mgr.load_latest()
        if latest is not None:
            it, ck_ids, ck_vals, meta = latest
            if np.array_equal(ck_ids, ids):
                labels = ck_vals.astype(np.int64)
                start_iter = it + 1
                resumed_from = it
                if meta.get("converged"):
                    return ids, labels, {
                        "iterations": it + 1,
                        "resumed_from": it,
                        "supersteps": [],
                    }

    supersteps = []
    converged = False
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        ids_ref, lab_ref = broadcast_state(ids, labels)
        msgs = blocks.map_batches(
            _make_min_fn(ids_ref, lab_ref), batch_format="pyarrow"
        )
        agg = bucketed_group_combine(
            msgs, ["dst"], min_by_int_key("dst", "partial", "dst", "incoming")
        )
        new_labels = labels.copy()
        for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
            idx = np.searchsorted(ids, b["dst"].to_numpy())
            np.minimum.at(new_labels, idx, b["incoming"].to_numpy())
        changed = int(np.count_nonzero(new_labels != labels))
        labels = new_labels
        dt = time.perf_counter() - t0
        supersteps.append({"iteration": it, "seconds": dt, "changed": changed})
        converged = changed == 0
        if mgr is not None:
            mgr.save(
                it, ids, labels, meta={"changed": changed, "converged": converged}
            )
        if converged:
            break

    info = {
        "iterations": len(supersteps) + start_iter,
        "converged": converged,
        "resumed_from": resumed_from,
        "supersteps": supersteps,
    }
    return ids, labels, info
