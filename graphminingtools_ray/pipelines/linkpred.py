"""Per-edge common-neighbor support (edge embeddedness) and neighborhood
Jaccard — the classic link-prediction / graph-cleaning scores.

For every edge (u,v) of the simple graph: cn = |N(u) ∩ N(v)| (the number of
triangles through the edge) and jaccard = cn / (deg(u)+deg(v)−cn)
(Liben-Nowell & Kleinberg 2003 neighborhood Jaccard over raw
neighborhoods). Edges in no triangle are omitted (cn = 0 rows carry no
signal and at web scale are most of the edge set).

Pipeline shape (same orientation discipline as algos.triangles — each
triangle is generated exactly once at its (degree,id)-minimal wedge
center, so hub wedge volume stays O(m^1.5) — but the per-EDGE credit needs
the triangle IDENTITY once, so instead of probing a partitioned index this
variant ships wedge candidate rows through a pair-keyed exchange):

1. simple graph + degree index (shared helpers from algos.triangles);
2. orientation map (degree lookup from the partitioned index);
3. ONE edge-scale exchange keyed part(center) → per-center sorted wedge
   pair expansion (a,b,center) — wedge-scale rows, the identity cost;
4. pair-keyed exchange of wedges UNIONed with the edge set: per bucket,
   closed wedges (pair is an edge) credit all THREE triangle edges,
   pre-combined per edge within the bucket (the combiner);
5. final edge-keyed sum exchange → (u,v,cn).

Reference: the reference probes wedges per small graph
(patternExtractor.c:274-294); this is the cross-partition big-graph edge-
support variant. SQL twin: the triangle CTE unnested to its three edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..algos.triangles import _degree_index, simple_undirected
from ..algos.partitioned import PartCache as _PartCache
from ..functions.bucketing import (
    bucketed_group_combine,
    int_bucket,
    partition_group_combine,
)
from ..functions.rounding import round_half_away
from ..graph.build import _pairs_from_sorted_key_items

_NO_CAP = np.iinfo(np.int64).max


def edge_common_neighbors(edges, num_buckets: int = 32,
                          assume_simple: bool = False):
    """-> Dataset of (u, v, cn) for every simple-graph edge in ≥1 triangle
    (u < v). Exact counts, deterministic. ``assume_simple=True`` skips the
    distinct exchange when the input is already a (src<dst) distinct pair
    table (e.g. a previous truss round's survivors)."""
    P = num_buckets
    if assume_simple:
        simple = edges.select_columns(["src", "dst"]).materialize()
    else:
        simple = simple_undirected(edges, num_buckets=P).materialize()
    deg_ds, deg_index, _ = _degree_index(simple, P)
    deg_index_ref = ray.put(deg_index)

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

    def wedge_rows(t: pa.Table) -> pa.Table:
        """Per-center wedge pairs with the center identity. Pairs inherit
        the (deg,id) orientation from the (center, deg_out, out) sort, the
        same closing-edge convention as the triangle counter."""
        c = t["center"].to_numpy()
        o = t["out"].to_numpy()
        dg = t["deg_out"].to_numpy()
        ordr = np.lexsort((o, dg, c))
        a, b, centers = _pairs_from_sorted_key_items(
            c[ordr], o[ordr], _NO_CAP, return_keys=True
        )
        return pa.table({"a": a, "b": b, "x": centers})

    wedges = partition_group_combine(oriented, "part", P, wedge_rows)

    # pair-keyed exchange: wedges + the edge set in one tagged stream
    # (edge rows have x = -1; vertex ids are nonnegative). The edge side is
    # the ORIENTED pairs (center→out): wedge pairs follow the
    # (degree, id) orientation, so the closing edge appears oriented too.
    edge_tag = oriented.map_batches(
        lambda t: pa.table({"a": t["center"], "b": t["out"],
                            "x": pa.array(np.full(t.num_rows, -1,
                                                  np.int64))}),
        batch_format="pyarrow",
    )

    def close_and_credit(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        x = t["x"].to_numpy()
        is_edge = x == -1
        # membership: pack pair keys locally (bucket-local dense remap)
        uniq = np.unique(np.concatenate([a, b]))
        nloc = np.int64(len(uniq))
        pk = np.searchsorted(uniq, a) * nloc + np.searchsorted(uniq, b)
        edge_keys = np.unique(pk[is_edge])
        wa, wb, wx = a[~is_edge], b[~is_edge], x[~is_edge]
        wk = pk[~is_edge]
        pos = np.searchsorted(edge_keys, wk)
        pos_c = np.minimum(pos, len(edge_keys) - 1) if len(edge_keys) else pos
        closed = (edge_keys[pos_c] == wk) if len(edge_keys) else np.zeros(
            len(wk), bool)
        ta, tb, tx = wa[closed], wb[closed], wx[closed]
        # credit the three edges of each triangle, min-max normalized
        # ((ta,tb) follows the degree orientation, not id order)
        eu = np.concatenate([np.minimum(ta, tb), np.minimum(tx, ta),
                             np.minimum(tx, tb)])
        ev = np.concatenate([np.maximum(ta, tb), np.maximum(tx, ta),
                             np.maximum(tx, tb)])
        # in-bucket pre-combine per edge (the combiner)
        key2 = np.stack([eu, ev], axis=1)
        if len(key2):
            uniq2, cnt = np.unique(key2, axis=0, return_counts=True)
        else:
            uniq2 = np.empty((0, 2), np.int64)
            cnt = np.empty(0, np.int64)
        return pa.table({"u": uniq2[:, 0], "v": uniq2[:, 1],
                         "cn": cnt.astype(np.int64)})

    credited = bucketed_group_combine(
        wedges.union(edge_tag), ["a", "b"], close_and_credit,
        num_buckets=P,
    )

    def sum_pairs(t: pa.Table) -> pa.Table:
        key2 = np.stack([t["u"].to_numpy(), t["v"].to_numpy()], axis=1)
        cn = t["cn"].to_numpy()
        if len(key2) == 0:
            return pa.table({"u": np.empty(0, np.int64),
                             "v": np.empty(0, np.int64),
                             "cn": np.empty(0, np.int64)})
        uniq2, inv = np.unique(key2, axis=0, return_inverse=True)
        tot = np.bincount(inv, weights=cn, minlength=len(uniq2))
        return pa.table({"u": uniq2[:, 0], "v": uniq2[:, 1],
                         "cn": tot.astype(np.int64)})

    return bucketed_group_combine(credited, ["u", "v"], sum_pairs,
                                  num_buckets=P), deg_ds


def edge_jaccard_dataset(edges, num_buckets: int = 32):
    """Full per-edge Jaccard as a STREAMING Dataset (src, dst,
    common_neighbors, deg_src, deg_dst, jaccard) — the job-level variant
    with no driver materialization: degrees attach per batch from the
    partitioned degree index (broadcast refs, zero-copy object-store
    reads), so edge-scale output flows straight to a parquet sink."""
    from ..algos.partitioned import index_state

    P = num_buckets
    cn_ds, deg_ds = edge_common_neighbors(edges, num_buckets=P)
    deg_index, _ = index_state(deg_ds)
    ref = ray.put(deg_index)

    def attach(t: pa.Table) -> pa.Table:
        cache = _PartCache(ray.get(ref), ["ids", "deg"])
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        cn = t["cn"].to_numpy()

        def lookup(vids: np.ndarray) -> np.ndarray:
            out = np.empty(len(vids), np.int64)
            parts = int_bucket(vids, P)
            for p in np.unique(parts):
                m = parts == p
                ids_p, deg_p = cache.get(int(p))
                out[m] = deg_p[np.searchsorted(ids_p, vids[m])]
            return out

        du, dv = lookup(u), lookup(v)
        return pa.table({
            "src": u,
            "dst": v,
            "common_neighbors": cn,
            "deg_src": du,
            "deg_dst": dv,
            "jaccard": round_half_away(cn / (du + dv - cn), 9),
        })

    return cn_ds.map_batches(attach, batch_format="pyarrow")


def edge_jaccard_query(sf_dir: str):
    """Gate query: common neighbors + neighborhood Jaccard per co-purchase
    edge in ≥1 triangle. Jaccard = cn / (deg_u + deg_v − cn): exact ints
    into one elementwise float division + round-9, hash-exact vs SQL.
    Gate-scale sink of the distributed :func:`edge_jaccard_dataset`."""
    from ..graph.build import copurchase_edges

    out = edge_jaccard_dataset(copurchase_edges(sf_dir)).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def k_truss(edges, k: int = 10, num_buckets: int = 32,
            max_rounds: int = 64):
    """k-truss decomposition (Cohen 2008): the maximal subgraph in which
    every edge lies in >= k-2 triangles OF THE SUBGRAPH. Synchronous
    peeling — recompute edge supports over the survivors and drop
    under-supported edges until stable. Each round is one distributed
    support pass (edge_common_neighbors — wedge-oriented, O(m^1.5)); the
    driver holds only the per-round edge COUNT scalar, never the edges.

    -> (Dataset of surviving (src, dst), info). The k-truss is unique, so
    synchronous rounds reach the same fixpoint as sequential peeling."""
    simple = simple_undirected(edges, num_buckets=num_buckets)
    cur = simple.materialize()
    n_edges = cur.count()
    rounds = []
    for r in range(max_rounds):
        if n_edges == 0:
            break
        cn_ds, _ = edge_common_neighbors(cur, num_buckets=num_buckets,
                                         assume_simple=True)
        # survivors: support >= k-2 (edges in no triangle are absent from
        # cn_ds and so drop out for any k >= 3)
        nxt = cn_ds.filter(expr=f"cn >= {k - 2}").map_batches(
            lambda t: pa.table({"src": t["u"], "dst": t["v"]}),
            batch_format="pyarrow",
        ).materialize()
        n_next = nxt.count()
        rounds.append({"round": r, "edges_in": n_edges,
                       "edges_out": n_next})
        cur = nxt
        if n_next == n_edges:
            break
        n_edges = n_next
    return cur, {"rounds": rounds, "k": k, "n_edges": n_edges}


def k_truss_query(sf_dir: str, k: int = 10):
    """Gate query: the k=10 truss edge set of the co-purchase graph
    (src < dst). SQL twin unrolls the peel rounds (idempotent at the
    fixpoint; sf0.01 peels in 8 rounds, the unroll is 16)."""
    from ..graph.build import copurchase_edges

    truss, _ = k_truss(copurchase_edges(sf_dir), k=k)
    return truss.to_pandas().sort_values(["src", "dst"]).reset_index(
        drop=True)
