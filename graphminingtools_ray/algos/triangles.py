"""Exact triangle counting (global + per-vertex) — north-star op.

Reference semantics: triangles enumerated as length-2 paths plus a
closing-edge probe (``/root/reference/executables/patternExtractor.c:274-294``,
``hasEdge`` probe at ``:285``). Round-2 FULLY DISTRIBUTED re-expression —
no driver-held edge-key array, no driver broadcast, no global ``u*n+v``
packing. The join-side choice is deliberate: the wedge set is O(m^1.5) and
the edge set is O(m), so instead of SHUFFLING wedges to the edges (the
textbook MapReduce shape, measured 4× slower here), the EDGE side is built
into a hash-PARTITIONED probe index living in the object store — each
expansion task fetches only the index partitions its pairs hash to
(zero-copy plasma reads, shared per node) and probes in place. That is the
standard "ship the small side" join decision, with the small side kept
partitioned rather than driver-concatenated:

1. simple graph: distinct undirected (u < v) pairs (skippable via
   ``assume_simple`` when the input is already a distinct pair table);
2. degree index: one keyed exchange → per-partition (ids, deg) rows,
   driver holds {part: block_ref} only;
3. orientation: stateless map over edges, degrees looked up from the index
   (per-task partition cache) — orient toward larger (degree, id);
4. center partitioning: ONE edge-scale exchange keyed part(center); each
   partition row stores its oriented out-edges AND its sorted local-packed
   probe keys;
5. wedge expansion + closing-edge probe: map over the partition rows —
   vectorized pair expansion, pairs grouped by part(a), membership via
   ``np.searchsorted`` against the fetched probe partitions; per-vertex
   count partials emitted;
6. per-vertex counts: final keyed sum, unioned with the vertex inventory
   (zero-triangle vertices included).

Each triangle is generated exactly once at its (degree, id)-minimal vertex;
hub wedges are tamed by the orientation (out-degree ≤ O(sqrt(m))).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.bucketing import (
    bucketed_group_combine,
    int_bucket,
    partition_group_combine,
    sum_by_int_key,
)
from ..graph.build import _pairs_from_sorted_key_items
from .partitioned import PartCache as _PartCache
from .partitioned import get_part, index_state, _row_lists

_NO_CAP = np.iinfo(np.int64).max


@ray.remote
def _dense_probe_bitmap(gids: np.ndarray, V: int, *part_blocks) -> np.ndarray:
    """V×V closing-edge bitmap over vertex RANKS (bit rank(c)·V+rank(o) set
    per oriented edge) from the partition rows' (center, out) lists — one
    m-scale pass, pinned once in plasma, read zero-copy by every expansion
    task. Only built when V ≤ GRAFT_TRI_DENSE_V."""
    bm = np.zeros((V * V + 63) // 64 or 1, np.uint64)
    for b in part_blocks:
        t = b if isinstance(b, pa.Table) else pa.table(b)
        for row in range(t.num_rows):
            c = t["center"][row].values.to_numpy(zero_copy_only=False)
            o = t["out"][row].values.to_numpy(zero_copy_only=False)
            q = np.searchsorted(gids, c) * np.int64(V) + np.searchsorted(gids, o)
            # ufunc.at: duplicate word indices (distinct bits sharing a
            # 64-bit word) must all land — fancy |= would drop all but one
            np.bitwise_or.at(
                bm, q >> 6, np.uint64(1) << (q & 63).astype(np.uint64)
            )
    return bm


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


def _degree_index(simple: rd.Dataset, P: int):
    """One keyed exchange → per-partition (part, ids, deg) rows in the object
    store; returns (dataset, {part: (block_ref, row)})."""

    def partials(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {"part": int_bucket(uv, P), "vertex_id": uv,
             "partial": cnt.astype(np.int64)}
        )

    def combine(t: pa.Table) -> pa.Table:
        part = int(t["part"][0].as_py())
        v = t["vertex_id"].to_numpy()
        c = t["partial"].to_numpy()
        ids = np.unique(v)
        deg = np.zeros(len(ids), dtype=np.int64)
        np.add.at(deg, np.searchsorted(ids, v), c)
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "ids": pa.array([ids], pa.list_(pa.int64())),
                "deg": pa.array([deg], pa.list_(pa.int64())),
                "n": pa.array([len(ids)], pa.int64()),
            }
        )

    ds = partition_group_combine(
        simple.map_batches(partials, batch_format="pyarrow"), "part", P, combine
    ).materialize()
    index, scalars = index_state(ds, ["n"])
    return ds, index, scalars




def triangle_counts(edges: rd.Dataset, num_buckets: int = 32,
                    assume_simple: bool = False):
    """-> (vertex_ids, per_vertex_counts, global_count). numpy result
    delivery over the distributed pipeline; ``triangle_counts_dataset`` is
    the streaming variant."""
    counts_ds = triangle_counts_dataset(
        edges, num_buckets=num_buckets, assume_simple=assume_simple
    )
    ids_parts, cnt_parts = [], []
    for b in counts_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        ids_parts.append(b["vertex_id"].to_numpy())
        cnt_parts.append(b["n_triangles"].to_numpy())
    if not ids_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    ids = np.concatenate(ids_parts)
    counts = np.concatenate(cnt_parts)
    order = np.argsort(ids, kind="stable")
    ids, counts = ids[order], counts[order]
    total = int(counts.sum()) // 3
    return ids, counts, total


def triangle_counts_dataset(
    edges: rd.Dataset, num_buckets: int = 32, assume_simple: bool = False
) -> rd.Dataset:
    """Dataset of (vertex_id, n_triangles) for every vertex of the simple
    graph — the streaming/at-scale API. ``assume_simple=True`` skips the
    distinct exchange when the input is already a (src<dst) distinct table
    (e.g. the output of ``keyed_self_pairs``).

    Probe selection is density-adaptive: when the vertex universe fits a
    V×V adjacency BITMAP under ``GRAFT_TRI_DENSE_V`` (default 2^15 →
    ≤128 MiB), the closing-edge probe is one plasma-pinned bit array read
    zero-copy by every expansion task — O(1) per wedge, no per-partition
    grouping, no pair sort (measured ~4× CPU on the dense sf0.1 co-purchase
    graph, where wedge volume is the whole pipeline). Past the cutoff the
    partitioned probe index is the scale path: V² bits is impossible at
    10^8+ vertices, partition state stays node-sized, and each task fetches
    only the index partitions its pairs hash to. Both paths count the same
    triangles bit-identically (pytest-pinned)."""
    import os

    P = num_buckets
    if assume_simple:
        simple = edges.select_columns(["src", "dst"]).materialize()
    else:
        simple = simple_undirected(edges, num_buckets=num_buckets).materialize()

    deg_ds, deg_index, deg_scalars = _degree_index(simple, P)
    deg_index_ref = ray.put(deg_index)
    n_vertices = sum(s["n"] for s in deg_scalars.values())
    dense_cap = int(os.environ.get("GRAFT_TRI_DENSE_V", str(1 << 15)))
    dense = 0 < n_vertices <= dense_cap

    def orient(batch: pa.Table) -> pa.Table:
        cache = _PartCache(ray.get(deg_index_ref), ["ids", "deg"])
        u = batch["src"].to_numpy()
        v = batch["dst"].to_numpy()

        def lookup(vids: np.ndarray) -> np.ndarray:
            out = np.empty(len(vids), dtype=np.int64)
            parts = int_bucket(vids, P)
            for p in np.unique(parts):
                m = parts == p
                ids_p, deg_p = cache.get(int(p))
                out[m] = deg_p[np.searchsorted(ids_p, vids[m])]
            return out

        du, dv = lookup(u), lookup(v)
        u_first = (du < dv) | ((du == dv) & (u < v))
        center = np.where(u_first, u, v)
        out = np.where(u_first, v, u)
        deg_out = np.where(u_first, dv, du)
        return pa.table(
            {
                "part": int_bucket(center, P),
                "center": center,
                "out": out,
                "deg_out": deg_out,
            }
        )

    oriented = simple.map_batches(orient, batch_format="pyarrow")

    def build_part(t: pa.Table) -> pa.Table:
        """One partition's oriented out-edges + (partitioned path only) its
        sorted local-packed probe keys (bucket-local dense remap →
        int64-safe at any id range). The dense path probes the global
        bitmap instead, so the keys stay empty there."""
        part = int(t["part"][0].as_py())
        c = t["center"].to_numpy()
        o = t["out"].to_numpy()
        dg = t["deg_out"].to_numpy()
        ordr = np.lexsort((o, dg, c))
        if dense:
            uniq = np.empty(0, np.int64)
            keys = np.empty(0, np.int64)
        else:
            uniq = np.unique(np.concatenate([c, o]))
            keys = np.sort(
                np.searchsorted(uniq, c) * np.int64(len(uniq))
                + np.searchsorted(uniq, o)
            )
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "center": pa.array([c[ordr]], pa.list_(pa.int64())),
                "out": pa.array([o[ordr]], pa.list_(pa.int64())),
                "uniq": pa.array([uniq], pa.list_(pa.int64())),
                "keys": pa.array([keys], pa.list_(pa.int64())),
            }
        )

    parts_ds = partition_group_combine(oriented, "part", P, build_part).materialize()
    probe_index, _ = index_state(parts_ds, [])
    probe_index_ref = ray.put(probe_index)

    if dense:
        # global vertex rank table — V-scale by the cutoff definition
        gids = np.sort(
            np.concatenate(
                [get_part(deg_index, p, ["ids"])[0] for p in sorted(deg_index)]
            )
            if deg_index
            else [np.empty(0, np.int64)]
        )
        gid_ref = ray.put(gids)
        from .partitioned import _block_refs

        bitmap_ref = _dense_probe_bitmap.remote(
            gid_ref, n_vertices, *_block_refs(parts_ds)
        )

    def expand_dense(t: pa.Table) -> pa.Table:
        """Dense-path expansion: wedges probe the plasma-pinned V×V bitmap
        in rank space — O(1) per wedge, no pair sort, no partition loop."""
        bm = ray.get(bitmap_ref)
        gids_l = ray.get(gid_ref)
        V = np.int64(n_vertices)
        vids_all, partials_all = [], []
        for row in range(t.num_rows):
            c = t["center"][row].values.to_numpy(zero_copy_only=False)
            o = t["out"][row].values.to_numpy(zero_copy_only=False)
            # remap ONCE at edge scale; searchsorted against the sorted
            # rank table is order-preserving, so the (center, deg_out, out)
            # pre-sort that fixes pair orientation survives the remap
            cr = np.searchsorted(gids_l, c)
            orr = np.searchsorted(gids_l, o)
            a, b_, centers = _pairs_from_sorted_key_items(
                cr, orr, _NO_CAP, return_keys=True
            )
            if len(a) == 0:
                continue
            q = a * V + b_
            closed = (
                (bm[q >> 6] >> (q & 63).astype(np.uint64)) & np.uint64(1)
            ).astype(bool)
            corners = np.concatenate([centers[closed], a[closed], b_[closed]])
            vid, cnt = np.unique(corners, return_counts=True)
            vids_all.append(gids_l[vid])
            partials_all.append(cnt.astype(np.int64))
        if not vids_all:
            return pa.table(
                {"vertex_id": np.empty(0, np.int64),
                 "partial": np.empty(0, np.int64)}
            )
        return pa.table(
            {
                "vertex_id": np.concatenate(vids_all),
                "partial": np.concatenate(partials_all),
            }
        )

    def expand_probe(t: pa.Table) -> pa.Table:
        cache = _PartCache(ray.get(probe_index_ref), ["uniq", "keys"])
        vids_all, partials_all = [], []
        for row in range(t.num_rows):
            c = t["center"][row].values.to_numpy(zero_copy_only=False)
            o = t["out"][row].values.to_numpy(zero_copy_only=False)
            # rows are pre-sorted by (center, deg_out, out): emitted pairs
            # (a, b) satisfy (deg_a, a) < (deg_b, b) = closing-edge orientation
            a, b_, centers = _pairs_from_sorted_key_items(
                c, o, _NO_CAP, return_keys=True
            )
            if len(a) == 0:
                continue
            # sort pairs by (part, a) once: partition subsets become
            # contiguous slices (no per-partition O(pairs) boolean masks)
            # and the searchsorted queries hit the probe arrays in
            # mostly-ascending order (cache-friendly binary-search descent).
            # Two keys, not three: the third (b) key bought nothing the
            # a-ordering doesn't and cost ~35% of the whole sort
            closed = np.zeros(len(a), dtype=bool)
            pparts = int_bucket(a, P)
            order = np.lexsort((a, pparts))
            a_s, b_s = a[order], b_[order]
            bounds = np.searchsorted(pparts[order], np.arange(P + 1))
            for p in range(P):
                lo, hi = int(bounds[p]), int(bounds[p + 1])
                if lo == hi:
                    continue
                entry = cache.get(p)
                if entry is None:
                    continue
                uniq, keys = entry
                aa, bb = a_s[lo:hi], b_s[lo:hi]
                pa_ = np.searchsorted(uniq, aa)
                pb_ = np.searchsorted(uniq, bb)
                nloc = np.int64(len(uniq))
                pa_c = np.minimum(pa_, nloc - 1)
                pb_c = np.minimum(pb_, nloc - 1)
                present = (uniq[pa_c] == aa) & (uniq[pb_c] == bb)
                q = pa_c * nloc + pb_c
                pos = np.minimum(np.searchsorted(keys, q), len(keys) - 1)
                closed[order[lo + np.flatnonzero(present & (keys[pos] == q))]] = True
            corners = np.concatenate([centers[closed], a[closed], b_[closed]])
            vid, cnt = np.unique(corners, return_counts=True)
            vids_all.append(vid)
            partials_all.append(cnt.astype(np.int64))
        if not vids_all:
            return pa.table(
                {"vertex_id": np.empty(0, np.int64),
                 "partial": np.empty(0, np.int64)}
            )
        return pa.table(
            {
                "vertex_id": np.concatenate(vids_all),
                "partial": np.concatenate(partials_all),
            }
        )

    partials = parts_ds.map_batches(
        expand_dense if dense else expand_probe,
        batch_format="pyarrow", batch_size=1,
    )

    def inventory_rows(t: pa.Table) -> pa.Table:
        out = []
        for row in range(t.num_rows):
            (ids,) = _row_lists(t, row, ["ids"])
            out.append(ids)
        vid = (
            np.concatenate(out) if out else np.empty(0, np.int64)
        )
        return pa.table(
            {"vertex_id": vid, "partial": np.zeros(len(vid), np.int64)}
        )

    inventory = deg_ds.map_batches(inventory_rows, batch_format="pyarrow")
    return bucketed_group_combine(
        partials.union(inventory),
        ["vertex_id"],
        sum_by_int_key("vertex_id", "partial", "vertex_id", "n_triangles"),
        num_buckets=num_buckets,
    )
