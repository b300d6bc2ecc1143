"""Levelwise mining — level 1: frequent vertex labels and frequent edge
label triples over a transactional graph DB
(reference: ``/root/reference/lwm_initAndCollect.c:246-295`` frequent
vertices, ``:298-392`` frequent edges; the trie-based partial+final
aggregate of ``searchTree.c:372-456`` becomes per-graph distinct →
groupby(label).count → HAVING, per SURVEY §2.5).

The transactional DB is derived from the driver tables: one graph per
order; vertices = the order's parts labeled by ``p_brand``; edges connect
parts of CONSECUTIVE line numbers, labeled by the later line's
``l_returnflag``. Edge identity for mining is the canonical label triple
``(min(l_u, l_v), l_e, max(l_u, l_v))`` exactly as the reference canonizes
(``lwm_initAndCollect.c:298-392``; canonical ordering per SURVEY §2.5).

Support thresholds are a deterministic function of DB size
(``floor(frac * n_graphs)``) so engine and SQL agree exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.bucketing import bucketed_group_combine
from ..sources.tables import read_table


def _brand_map(sf_dir: str) -> dict[int, str]:
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    return dict(zip(part["p_partkey"], part["p_brand"]))


def order_graph_edges(sf_dir: str) -> rd.Dataset:
    """(graph_id=l_orderkey, la, le, lb) edge rows of the per-order graphs,
    with la <= lb the canonical brand pair and le the edge label.

    Consecutive-line pairing needs each order's lines together and sorted —
    a hash-bucketed exchange keyed on the order, then a vectorized
    adjacent-row pairing per bucket."""
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"],
    )
    bm = _brand_map(sf_dir)
    bm_ref = ray.put(bm)

    def pair_consecutive(t: pa.Table) -> pa.Table:
        _bm = ray.get(bm_ref)
        ok = t["l_orderkey"].to_numpy()
        ln = t["l_linenumber"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        rf = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        # full deterministic order: (order, linenumber, partkey, returnflag)
        # — (order, linenumber) alone is NOT unique in this data, and the
        # SQL oracle's window must sort identically
        order = np.lexsort((rf, pk, ln, ok))
        ok, ln, pk, rf = ok[order], ln[order], pk[order], rf[order]
        same = ok[1:] == ok[:-1]  # consecutive rows of the same order
        brands = np.asarray([_bm[int(p)] for p in pk], dtype=object)
        bu = brands[:-1][same]
        bv = brands[1:][same]
        la = np.minimum(bu, bv)
        lb = np.maximum(bu, bv)
        return pa.table(
            {
                "graph_id": ok[1:][same],
                "la": pa.array(la.tolist(), pa.string()),
                "le": pa.array(rf[1:][same].tolist(), pa.string()),
                "lb": pa.array(lb.tolist(), pa.string()),
            }
        )

    return bucketed_group_combine(li, ["l_orderkey"], pair_consecutive)


def _n_graphs(sf_dir: str) -> int:
    """DB size = number of distinct orders appearing in lineitem."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({"graph_id": np.unique(t["l_orderkey"].to_numpy())})

    parts = [
        b["graph_id"].to_numpy()
        for b in li.map_batches(uniq, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    return len(np.unique(np.concatenate(parts)))


def order_graph_edges_full(sf_dir: str) -> rd.Dataset:
    """Distinct labeled edges of the per-order graphs WITH endpoints:
    (graph_id, va, vb, ba, bb, le) — va/vb part keys, ba/bb their brands,
    le the edge label. Self-loop edges (same part on consecutive lines)
    excluded."""
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"],
    )
    bm_ref = ray.put(_brand_map(sf_dir))

    def pair_consecutive(t: pa.Table) -> pa.Table:
        _bm = ray.get(bm_ref)
        df = pd.DataFrame(
            {
                "o": t["l_orderkey"].to_numpy(),
                "ln": t["l_linenumber"].to_numpy(),
                "pk": t["l_partkey"].to_numpy(),
                "rf": t["l_returnflag"].to_pylist(),
            }
        ).sort_values(["o", "ln", "pk", "rf"])
        same = df["o"].to_numpy()[1:] == df["o"].to_numpy()[:-1]
        va = df["pk"].to_numpy()[:-1][same]
        vb = df["pk"].to_numpy()[1:][same]
        o = df["o"].to_numpy()[1:][same]
        le = np.asarray(df["rf"].tolist()[1:], dtype=object)[same]
        m = va != vb
        out = pd.DataFrame(
            {"graph_id": o[m], "va": va[m], "vb": vb[m], "le": le[m]}
        ).drop_duplicates()
        out["ba"] = out["va"].map(_bm)
        out["bb"] = out["vb"].map(_bm)
        return pa.Table.from_pandas(
            out[["graph_id", "va", "vb", "ba", "bb", "le"]], preserve_index=False
        )

    return bucketed_group_combine(li, ["l_orderkey"], pair_consecutive)


def frequent_wedge_patterns(sf_dir: str, min_support: int = 3):
    """Level-2 levelwise mining: frequent 2-edge path (wedge) patterns.

    A wedge at center vertex v = an unordered pair of DISTINCT incident
    edges; its canonical pattern string is
        ``center_brand(min(tok1,tok2),max(tok1,tok2))`` with tok = le:brand
    of the far endpoint — the engine's analog of the reference's size-3 tree
    patterns with canonical-string identity (treeEnumeration/apriori,
    ``lwm_miningAndExtension.c:56-158``). Support = number of graphs
    containing the pattern; HAVING >= an absolute min_support (the wedge
    pattern space is large, so fractional thresholds empty out at small
    scales)."""
    threshold = min_support
    edges = order_graph_edges_full(sf_dir)

    def wedges_per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # halves: one row per (edge, endpoint-as-center)
        h1 = df.rename(columns={"va": "v", "ba": "bv", "vb": "other", "bb": "bo"})
        h2 = df.rename(columns={"vb": "v", "bb": "bv", "va": "other", "ba": "bo"})
        half = pd.concat(
            [h1[["graph_id", "v", "bv", "other", "bo", "le"]],
             h2[["graph_id", "v", "bv", "other", "bo", "le"]]],
            ignore_index=True,
        )
        # incident-edge identity at a center is (other, le): a reversed
        # duplicate edge contributes the same half and must not self-pair
        half = half.drop_duplicates(subset=["graph_id", "v", "other", "le"])
        half = half.sort_values(["graph_id", "v", "other", "le"], kind="stable")
        half = half.reset_index(drop=True)
        g = half["graph_id"].to_numpy()
        v = half["v"].to_numpy()
        # pack (graph, v) into one sortable key; rows already sorted by it
        key = np.unique(np.stack([g, v], axis=1), axis=0, return_inverse=True)[1]
        from ..graph.build import _pairs_from_sorted_key_items

        idx = np.arange(len(half))
        i, j = _pairs_from_sorted_key_items(key, idx, np.iinfo(np.int64).max)
        if len(i) == 0:
            return pa.table(
                {"graph_id": np.empty(0, np.int64),
                 "pattern": pa.array([], pa.string())}
            )
        tok = (half["le"] + ":" + half["bo"]).to_numpy()
        bv = half["bv"].to_numpy()
        t1 = np.minimum(tok[i], tok[j])
        t2 = np.maximum(tok[i], tok[j])
        pat = np.char.add(
            np.char.add(np.char.add(bv[i].astype(str), "("), t1.astype(str)),
            np.char.add(np.char.add(",", t2.astype(str)), ")"),
        )
        out = pd.DataFrame({"graph_id": g[i], "pattern": pat}).drop_duplicates()
        return pa.table(
            {
                "graph_id": out["graph_id"].to_numpy(np.int64),
                "pattern": pa.array(out["pattern"].tolist(), pa.string()),
            }
        )

    def distinct_then_count(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"graph_id": t["graph_id"].to_numpy(), "pattern": t["pattern"].to_pylist()}
        ).drop_duplicates()
        gg = df.groupby("pattern", sort=True).size()
        return pa.table(
            {
                "pattern": pa.array(gg.index.tolist(), pa.string()),
                "partial": gg.to_numpy(np.int64),
            }
        )

    wedges = bucketed_group_combine(edges, ["graph_id"], wedges_per_bucket)
    partials = bucketed_group_combine(wedges, ["graph_id"], distinct_then_count)
    out = (
        partials.groupby("pattern")
        .aggregate(Sum("partial", alias_name="support"))
        .to_pandas()
    )
    out["support"] = out["support"].astype(np.int64)
    out = out[out["support"] >= threshold].sort_values("pattern").reset_index(drop=True)
    return out


def frequent_vertex_labels(sf_dir: str, min_support_frac: float = 0.10):
    """Labels (brands) appearing in >= floor(frac * n_graphs) graphs."""
    threshold = int(np.floor(min_support_frac * _n_graphs(sf_dir)))
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    bm_ref = ray.put(_brand_map(sf_dir))

    def per_graph_distinct(t: pa.Table) -> pa.Table:
        # partial: distinct (graph, label) within batch (the reference's
        # per-graph local trie + resetToUnique)
        _bm = ray.get(bm_ref)
        ok = t["l_orderkey"].to_numpy()
        brands = np.asarray([_bm[int(p)] for p in t["l_partkey"].to_numpy()], object)
        df = pd.DataFrame({"graph_id": ok, "label": brands}).drop_duplicates()
        return pa.table(
            {
                "graph_id": df["graph_id"].to_numpy(np.int64),
                "label": pa.array(df["label"].tolist(), pa.string()),
            }
        )

    def distinct_then_count(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"graph_id": t["graph_id"].to_numpy(), "label": t["label"].to_pylist()}
        ).drop_duplicates()
        g = df.groupby("label", sort=True).size()
        return pa.table(
            {
                "label": pa.array(g.index.tolist(), pa.string()),
                "partial": g.to_numpy(np.int64),
            }
        )

    # exchange keyed on graph_id so per-graph dedup is global, then a tiny
    # final count over 25 labels
    per_graph = li.map_batches(per_graph_distinct, batch_format="pyarrow")
    partials = bucketed_group_combine(per_graph, ["graph_id"], distinct_then_count)
    out = (
        partials.groupby("label")
        .aggregate(Sum("partial", alias_name="support"))
        .to_pandas()
    )
    out["support"] = out["support"].astype(np.int64)
    out = out[out["support"] >= threshold].sort_values("label").reset_index(drop=True)
    return out


def frequent_edge_triples(sf_dir: str, min_support_frac: float = 0.004):
    """Canonical edge label triples occurring in >= floor(frac * n_graphs)
    graphs; triple serialized ``la|le|lb``."""
    threshold = int(np.floor(min_support_frac * _n_graphs(sf_dir)))
    edges = order_graph_edges(sf_dir)

    def to_triples(t: pa.Table) -> pa.Table:
        trip = [
            f"{a}|{e}|{b}"
            for a, e, b in zip(
                t["la"].to_pylist(), t["le"].to_pylist(), t["lb"].to_pylist()
            )
        ]
        df = pd.DataFrame(
            {"graph_id": t["graph_id"].to_numpy(), "triple": trip}
        ).drop_duplicates()
        return pa.table(
            {
                "graph_id": df["graph_id"].to_numpy(np.int64),
                "triple": pa.array(df["triple"].tolist(), pa.string()),
            }
        )

    def distinct_then_count(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"graph_id": t["graph_id"].to_numpy(), "triple": t["triple"].to_pylist()}
        ).drop_duplicates()
        g = df.groupby("triple", sort=True).size()
        return pa.table(
            {
                "triple": pa.array(g.index.tolist(), pa.string()),
                "partial": g.to_numpy(np.int64),
            }
        )

    triples = edges.map_batches(to_triples, batch_format="pyarrow")
    partials = bucketed_group_combine(triples, ["graph_id"], distinct_then_count)
    out = (
        partials.groupby("triple")
        .aggregate(Sum("partial", alias_name="support"))
        .to_pandas()
    )
    out["support"] = out["support"].astype(np.int64)
    out = out[out["support"] >= threshold].sort_values("triple").reset_index(drop=True)
    return out
