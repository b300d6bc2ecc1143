"""Shared pieces of the superstep algorithms.

Scale contract (documented, deliberate): the per-vertex STATE VECTOR lives on
the driver as sorted numpy arrays and is broadcast each superstep via
``ray.put`` (read zero-copy from the object store by every task). Vertex
state is ~16 bytes/vertex — 1.6 GB at 10^8 vertices — while the EDGE data
(100-1000x larger) never leaves the distributed adjacency-block dataset and
messages are pre-aggregated per block before the ``groupby(dst)`` exchange.
When the vertex vector itself outgrows driver memory the framework's
documented escape hatch is hash-co-partitioned state (see SURVEY §4); the
broadcast is isolated in ``broadcast_state`` so only that seam changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..graph.csr import unpack_block


def _iter_block_rows(batch: pa.Table):
    for row in range(batch.num_rows):
        yield unpack_block(batch, row)


def collect_vertex_ids(blocks: rd.Dataset) -> np.ndarray:
    """Sorted unique vertex ids appearing as src or dst in any block.
    Distributed dedup per block, small union stream to the driver."""

    def uniq(batch: pa.Table) -> pa.Table:
        ids = [
            np.union1d(srcs, dst_unique)
            for srcs, _, dst_unique, _, _ in _iter_block_rows(batch)
        ]
        out = np.unique(np.concatenate(ids)) if ids else np.empty(0, np.int64)
        return pa.table({"vertex_id": out})

    parts = []
    for b in blocks.map_batches(uniq, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        parts.append(b["vertex_id"].to_numpy())
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


def out_degrees(blocks: rd.Dataset, ids: np.ndarray, weighted: bool = False) -> np.ndarray:
    """Out-degree (or out-weight-sum) aligned to ``ids``. Per-block partial
    bincount (combiner), final combine on the driver over the partial stream."""

    def partial(batch: pa.Table) -> pa.Table:
        accs, keys = [], []
        for srcs, src_index, _, _, w in _iter_block_rows(batch):
            weights = w if weighted else None
            acc = np.bincount(src_index, weights=weights, minlength=len(srcs))
            keys.append(srcs)
            accs.append(acc.astype(np.float64))
        if not keys:
            return pa.table({"src": np.empty(0, np.int64), "deg": np.empty(0, np.float64)})
        return pa.table({"src": np.concatenate(keys), "deg": np.concatenate(accs)})

    # collect partials, then accumulate in a CANONICAL (src, deg) order so the
    # float sum is bit-identical regardless of Ray's batch arrival order
    ks, ds = [], []
    for b in blocks.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        ks.append(b["src"].to_numpy())
        ds.append(b["deg"].to_numpy())
    deg = np.zeros(len(ids), dtype=np.float64)
    if ks:
        k_all = np.concatenate(ks)
        d_all = np.concatenate(ds)
        order = np.lexsort((d_all, k_all))
        np.add.at(deg, np.searchsorted(ids, k_all[order]), d_all[order])
    return deg


def edges_digest(blocks: rd.Dataset) -> str:
    """Order-independent content digest of the edge table (checkpoint lineage
    key): commutative sum of per-edge mixes, so partitioning/scheduling order
    cannot change it."""
    MASK = (1 << 64) - 1

    def mix(batch: pa.Table) -> pa.Table:
        total = 0
        n = 0
        for srcs, src_index, dst_unique, dst_index, _ in _iter_block_rows(batch):
            s = srcs[src_index].astype(np.uint64)
            d = dst_unique[dst_index].astype(np.uint64)
            m = (s * np.uint64(0x9E3779B97F4A7C15) + d * np.uint64(0xC2B2AE3D27D4EB4F))
            total = (total + int(m.sum())) & MASK
            n += len(s)
        return pa.table({"mix": pa.array([total], pa.uint64()), "n": pa.array([n], pa.int64())})

    total, n = 0, 0
    for b in blocks.map_batches(mix, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        total = (total + int(b["mix"].to_numpy().sum())) & MASK
        n += int(b["n"].to_numpy().sum())
    return hashlib.blake2b(f"{n}:{total}".encode(), digest_size=16).hexdigest()


def block_summary(blocks: rd.Dataset, weighted: bool = False):
    """ONE pass over the adjacency blocks collecting everything the
    superstep loop needs: sorted vertex ids, out-degrees (or out-weight
    sums), total edge count, and the order-independent content digest.
    Replaces three separate scans (setup latency matters when supersteps
    are sub-second)."""
    MASK = (1 << 64) - 1

    def summarize(batch: pa.Table) -> pa.Table:
        keys, degs = [], []
        mix_total, n_edges = 0, 0
        for srcs, src_index, dst_unique, dst_index, w in _iter_block_rows(batch):
            weights = w if weighted else None
            acc = np.bincount(src_index, weights=weights, minlength=len(srcs))
            keys.append(srcs)
            degs.append(acc.astype(np.float64))
            keys.append(dst_unique)
            degs.append(np.zeros(len(dst_unique)))
            s = srcs[src_index].astype(np.uint64)
            d = dst_unique[dst_index].astype(np.uint64)
            m = (s * np.uint64(0x9E3779B97F4A7C15)
                 + d * np.uint64(0xC2B2AE3D27D4EB4F))
            mix_total = (mix_total + int(m.sum())) & MASK
            n_edges += len(s)
        if not keys:
            return pa.table(
                {"vertex_id": np.empty(0, np.int64),
                 "deg": np.empty(0, np.float64),
                 "mix": pa.array([], pa.uint64()), "n": pa.array([], pa.int64())}
            )
        k = np.concatenate(keys)
        d_ = np.concatenate(degs)
        pad = np.zeros(len(k), dtype=np.uint64)
        padn = np.zeros(len(k), dtype=np.int64)
        pad[0] = np.uint64(mix_total)
        padn[0] = n_edges
        return pa.table({"vertex_id": k, "deg": d_, "mix": pad, "n": padn})

    ids_parts, rows = [], []
    for b in blocks.map_batches(summarize, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        rows.append(
            (
                b["vertex_id"].to_numpy(),
                b["deg"].to_numpy(),
                int(b["mix"].to_numpy().sum(dtype=np.uint64) & np.uint64(MASK)),
                int(b["n"].to_numpy().sum()),
            )
        )
    if not rows:
        return (np.empty(0, np.int64), np.empty(0, np.float64), 0,
                hashlib.blake2b(b"0:0", digest_size=16).hexdigest())
    ids = np.unique(np.concatenate([r[0] for r in rows]))
    deg = np.zeros(len(ids), dtype=np.float64)
    mix, n_edges = 0, 0
    # canonical (vertex, deg) accumulation order → bit-identical weighted
    # degree sums independent of Ray's batch arrival order
    k_all = np.concatenate([r[0] for r in rows])
    d_all = np.concatenate([r[1] for r in rows])
    order = np.lexsort((d_all, k_all))
    np.add.at(deg, np.searchsorted(ids, k_all[order]), d_all[order])
    for _, _, m, n in rows:
        mix = (mix + m) & MASK
        n_edges += n
    digest = hashlib.blake2b(f"{n_edges}:{mix}".encode(), digest_size=16).hexdigest()
    return ids, deg, n_edges, digest


def broadcast_state(ids: np.ndarray, values: np.ndarray):
    """One superstep's broadcast: (ids_ref, values_ref). Tasks ray.get these
    (zero-copy shared memory on a node) and look vertices up via searchsorted."""
    return ray.put(ids), ray.put(np.ascontiguousarray(values))
