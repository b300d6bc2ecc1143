"""Exact triangle counting (global + per-vertex) — north-star op.

Reference semantics: triangles enumerated as length-2 paths plus a
closing-edge probe (``/root/reference/executables/patternExtractor.c:274-294``,
``hasEdge`` probe at ``:285``). Distributed re-expression with the standard
degree-ordered orientation so each triangle is generated exactly once at its
order-minimal vertex and hub wedges are tamed (SURVEY §2.11):

1. simple graph: distinct undirected pairs (u < v), self-loops dropped
   (hash-bucketed distinct — functions.bucketing);
2. total order ``(degree, id)``; orient every edge small→large;
3. wedges: hash-bucketed exchange keyed on the wedge CENTER; per bucket,
   fully vectorized pair expansion over the sorted (center, out) rows;
4. closing-edge probe: membership of the wedge pair in the simple edge set —
   broadcast as a sorted packed-key array, probed with ``np.searchsorted``
   inside the same bucket combine (the semi-join). At a scale where the
   edge set no longer broadcasts, this probe becomes a second bucketed
   semi-join on ``hash(pair)``; the probe is a seam inside ``wedge_probe``.

Per-vertex counts credit all three corners of each closed wedge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.bucketing import bucketed_group_combine
from ..graph.build import _pairs_from_sorted_key_items

_NO_CAP = np.iinfo(np.int64).max


def simple_undirected(edges: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """Distinct (src < dst) pairs, no self-loops, from any (src,dst) table."""

    def norm(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u != v
        packed = np.stack([u[m], v[m]], axis=1)
        uniq = np.unique(packed, axis=0)  # batch-local combiner
        return pa.table({"src": uniq[:, 0], "dst": uniq[:, 1]})

    def distinct(t: pa.Table) -> pa.Table:
        packed = np.stack([t["src"].to_numpy(), t["dst"].to_numpy()], axis=1)
        uniq = np.unique(packed, axis=0)
        return pa.table({"src": uniq[:, 0], "dst": uniq[:, 1]})

    return bucketed_group_combine(
        edges.map_batches(norm, batch_format="pyarrow"),
        ["src", "dst"],
        distinct,
        num_buckets=num_buckets,
    )


def triangle_counts(edges: rd.Dataset, num_buckets: int = 32):
    """-> (vertex_ids, per_vertex_counts, global_count)."""
    simple = simple_undirected(edges, num_buckets=num_buckets).materialize()

    # vertex ids + degrees (vertex-scale, driver-held by design — see
    # algos.common scale contract)
    ids_parts = []
    for b in simple.iter_batches(batch_size=None, batch_format="pyarrow"):
        ids_parts.append(
            np.unique(np.concatenate([b["src"].to_numpy(), b["dst"].to_numpy()]))
        )
    if not ids_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    ids = np.unique(np.concatenate(ids_parts))
    n = len(ids)
    deg = np.zeros(n, dtype=np.int64)
    edge_keys_parts = []
    for b in simple.iter_batches(batch_size=None, batch_format="pyarrow"):
        ui = np.searchsorted(ids, b["src"].to_numpy())
        vi = np.searchsorted(ids, b["dst"].to_numpy())
        np.add.at(deg, ui, 1)
        np.add.at(deg, vi, 1)
        edge_keys_parts.append(ui.astype(np.int64) * n + vi)
    edge_keys = np.sort(np.concatenate(edge_keys_parts))

    # total order: rank by (degree, id); orient edge toward larger rank
    order = np.lexsort((ids, deg))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)

    ids_ref = ray.put(ids)
    rank_ref = ray.put(rank)
    keys_ref = ray.put(edge_keys)

    def orient(batch: pa.Table) -> pa.Table:
        _ids = ray.get(ids_ref)
        _rank = ray.get(rank_ref)
        u = batch["src"].to_numpy()
        v = batch["dst"].to_numpy()
        ru = _rank[np.searchsorted(_ids, u)]
        rv = _rank[np.searchsorted(_ids, v)]
        lo_first = ru < rv
        src = np.where(lo_first, u, v)
        dst = np.where(lo_first, v, u)
        return pa.table({"center": src, "out": dst})

    oriented = simple.map_batches(orient, batch_format="pyarrow")

    def wedge_probe(t: pa.Table) -> pa.Table:
        """Per bucket: expand wedges of every center in the bucket, probe the
        closing edge, emit per-vertex partial counts."""
        _ids = ray.get(ids_ref)
        _keys = ray.get(keys_ref)
        c = t["center"].to_numpy()
        o = t["out"].to_numpy()
        ordr = np.lexsort((o, c))
        a, b_, centers = _pairs_from_sorted_key_items(
            c[ordr], o[ordr], _NO_CAP, return_keys=True
        )
        if len(a) == 0:
            return pa.table(
                {"vertex_id": np.empty(0, np.int64), "partial": np.empty(0, np.int64)}
            )
        ai = np.searchsorted(_ids, a)
        bi = np.searchsorted(_ids, b_)
        q = ai * len(_ids) + bi
        pos = np.searchsorted(_keys, q)
        pos = np.minimum(pos, len(_keys) - 1)
        closed = _keys[pos] == q
        corners = np.concatenate([centers[closed], a[closed], b_[closed]])
        vid, cnt = np.unique(corners, return_counts=True)
        return pa.table({"vertex_id": vid, "partial": cnt.astype(np.int64)})

    partials = bucketed_group_combine(
        oriented, ["center"], wedge_probe, num_buckets=num_buckets, spread=True
    )

    counts = np.zeros(n, dtype=np.int64)
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        idx = np.searchsorted(ids, b["vertex_id"].to_numpy())
        np.add.at(counts, idx, b["partial"].to_numpy())
    total = int(counts.sum()) // 3
    return ids, counts, total
