"""Levelwise path mining vs an unpruned brute-force oracle (apriori pruning
is an optimization, not a semantics change — anti-monotonicity makes the
pruned and unpruned results identical)."""

import duckdb
import numpy as np
import pandas as pd

from graphminingtools_ray.pipelines.levelwise import (
    canonical_path,
    levelwise_path_mining,
    _paths_of_graph,
)

SF = "/root/testdata/sf0.001"


def test_canonical_path_reversal_invariant():
    a = canonical_path(["x", "y", "z"], ["1", "2"])
    b = canonical_path(["z", "y", "x"], ["2", "1"])
    assert a == b
    assert canonical_path(["x"], []) == "x"


def _brute_force(sf, max_len, frac):
    con = duckdb.connect()
    rows = con.execute(f"""
        WITH pl AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_partkey, p_brand
                    FROM read_parquet('{sf}/lineitem.parquet') li
                    JOIN read_parquet('{sf}/part.parquet') p ON l_partkey = p_partkey),
        seq AS (SELECT l_orderkey, l_partkey, p_brand, l_returnflag,
                       lag(l_partkey) OVER w AS pk0, lag(p_brand) OVER w AS b0
                FROM pl WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_returnflag))
        SELECT l_orderkey, pk0, l_partkey, b0, p_brand, l_returnflag
        FROM seq WHERE pk0 IS NOT NULL AND pk0 <> l_partkey
    """).fetchall()
    n_graphs = con.execute(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    per_graph: dict = {}
    for o, va, vb, ba, bb, le in rows:
        per_graph.setdefault(o, []).append((va, vb, ba, bb, le))
    threshold = int(np.floor(frac * n_graphs))
    counts: dict[tuple, int] = {}
    for o, es in per_graph.items():
        df = pd.DataFrame(es, columns=["va", "vb", "ba", "bb", "le"])
        df = df.drop_duplicates()
        pats = _paths_of_graph(df, max_len)
        for lvl, ps in pats.items():
            for p in ps:
                counts[(lvl, p)] = counts.get((lvl, p), 0) + 1
    out = pd.DataFrame(
        [(l, p, c) for (l, p), c in counts.items() if c >= threshold],
        columns=["level", "pattern", "support"],
    )
    return out.sort_values(["level", "pattern"]).reset_index(drop=True)


def test_levelwise_matches_bruteforce():
    got = levelwise_path_mining(SF, max_len=3, min_support_frac=0.002)
    got = got.sort_values(["level", "pattern"]).reset_index(drop=True)
    want = _brute_force(SF, 3, 0.002)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["level"] == 1).any()  # at least level 1 non-empty
