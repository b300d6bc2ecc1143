"""Canonical-string pipelines over the per-order transactional graphs —
the engine analog of the reference's ``cstring`` executable + trie count
(``/root/reference/executables/cstring.c``; ``cs_Tree.c:342-366``): tree →
canonical string (or "No Tree"), then groupby(cstring) as the pattern
dictionary with counts (searchTree semantics, SURVEY §2.5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.bucketing import bucketed_group_combine
from ..functions.cstring import canonical_tree_string
from ..sources.tables import read_table


def order_tree_cstrings(sf_dir: str):
    """Per order: build the chain graph (vertices = parts labeled by brand,
    edges between consecutive line numbers labeled by the later line's
    returnflag) and canonicalize. Non-trees (repeated parts close cycles /
    multi-edges) yield the reference's "No Tree".

    Returns (cstring, n_graphs) sorted by count desc then cstring — the
    pattern dictionary with multiplicities."""
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"],
    )
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    bm_ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))

    def per_bucket(t: pa.Table) -> pa.Table:
        _bm = ray.get(bm_ref)
        df = pd.DataFrame(
            {
                "o": t["l_orderkey"].to_numpy(),
                "ln": t["l_linenumber"].to_numpy(),
                "pk": t["l_partkey"].to_numpy(),
                "rf": t["l_returnflag"].to_pylist(),
            }
        ).sort_values(["o", "ln", "pk", "rf"])
        out: dict[str, int] = {}
        for _, g in df.groupby("o", sort=False):
            pks = g["pk"].tolist()
            rfs = g["rf"].tolist()
            vids = {p: i for i, p in enumerate(dict.fromkeys(pks))}
            vertices = {i: _bm[p] for p, i in vids.items()}
            edges = [
                (vids[pks[i]], vids[pks[i + 1]], rfs[i + 1])
                for i in range(len(pks) - 1)
            ]
            s = canonical_tree_string(vertices, edges) or "No Tree"
            out[s] = out.get(s, 0) + 1
        return pa.table(
            {
                "cstring": pa.array(list(out), pa.string()),
                "partial": pa.array(list(out.values()), pa.int64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"cstring": t["cstring"].to_pylist(), "partial": t["partial"].to_numpy()}
        )
        g = df.groupby("cstring", sort=True)["partial"].sum()
        return pa.table(
            {
                "cstring": pa.array(g.index.tolist(), pa.string()),
                "n_graphs": g.to_numpy(np.int64),
            }
        )

    counts = bucketed_group_combine(
        bucketed_group_combine(li, ["l_orderkey"], per_bucket),
        ["cstring"],
        final,
    )
    return counts.sort(["n_graphs", "cstring"], descending=[True, False])
