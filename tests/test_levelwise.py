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


# ---------------------------------------------------------------------------
# general-TREE levelwise mining (round 2) vs an unpruned brute-force oracle
# ---------------------------------------------------------------------------

from graphminingtools_ray.algos.subtree_iso import subtree_iso_trees, tree_in_graph
from graphminingtools_ray.functions.cstring import canonical_tree_string
from graphminingtools_ray.pipelines.levelwise import levelwise_tree_mining


def _tree_subgraph_patterns(vertices, edges, max_k):
    """All canonical strings of connected acyclic edge subsets of size
    1..max_k (brute force: grow connected subsets from each minimum edge)."""
    out = {k: set() for k in range(1, max_k + 1)}
    m = len(edges)

    def grow(used: list, vset: set, min_idx: int):
        k = len(used)
        if k >= 1:
            sub_v = {v: vertices[v] for v in vset}
            sub_e = [edges[i] for i in used]
            c = canonical_tree_string(sub_v, sub_e)
            if c is not None:
                out[k].add(c)
        if k == max_k:
            return
        for j in range(min_idx + 1, m):
            if j in used:
                continue
            a, b, _ = edges[j]
            ina, inb = a in vset, b in vset
            if ina and inb:
                continue  # would close a cycle
            if not used or ina or inb:
                new_v = vset | {a, b}
                grow(used + [j], new_v, min_idx if used else j)

    for i in range(m):
        a, b, _ = edges[i]
        grow([i], {a, b}, i)
    # dedupe: subsets can be generated through multiple orders — sets handle it
    return out


def _tree_brute_force(sf, max_k, min_support):
    con = duckdb.connect()
    rows = con.execute(f"""
        WITH pl AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_partkey, p_brand
                    FROM read_parquet('{sf}/lineitem.parquet') li
                    JOIN read_parquet('{sf}/part.parquet') p ON l_partkey = p_partkey),
        seq AS (SELECT l_orderkey, l_partkey, p_brand, l_returnflag,
                       lag(l_partkey) OVER w AS pk0, lag(p_brand) OVER w AS b0
                FROM pl WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_returnflag))
        SELECT DISTINCT l_orderkey, pk0, l_partkey, b0, p_brand, l_returnflag
        FROM seq WHERE pk0 IS NOT NULL AND pk0 <> l_partkey
    """).fetchall()
    per_graph: dict = {}
    for o, va, vb, ba, bb, le in rows:
        per_graph.setdefault(o, {"v": {}, "e": set()})
        per_graph[o]["v"][va] = ba
        per_graph[o]["v"][vb] = bb
        per_graph[o]["e"].add((va, vb, le))
    counts: dict = {}
    for o, g in per_graph.items():
        pats = _tree_subgraph_patterns(g["v"], sorted(g["e"]), max_k)
        for lvl, ps in pats.items():
            for p in ps:
                counts[(lvl, p)] = counts.get((lvl, p), 0) + 1
    return pd.DataFrame(
        [(l, p, c) for (l, p), c in counts.items() if c >= min_support],
        columns=["level", "pattern", "support"],
    ).sort_values(["level", "pattern"]).reset_index(drop=True)


def test_levelwise_trees_matches_bruteforce():
    got = levelwise_tree_mining(SF, max_edges=3, min_support=2)
    got = got.sort_values(["level", "pattern"]).reset_index(drop=True)
    want = _tree_brute_force(SF, 3, 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["level"] >= 2).any()  # genuinely beyond single edges


def test_subtree_iso_dp_vs_backtracking():
    """The rooted-DP tree-in-TREE operator and the backtracking
    tree-in-GRAPH operator must agree whenever the host is a tree."""
    rng = np.random.default_rng(11)
    labels = ["a", "b", "c"]
    elabels = ["x", "y"]
    for trial in range(200):
        # random labeled host tree (random attachment)
        n = int(rng.integers(2, 9))
        hv = {i: labels[rng.integers(0, len(labels))] for i in range(n)}
        he = [
            (int(rng.integers(0, i)), i, elabels[rng.integers(0, len(elabels))])
            for i in range(1, n)
        ]
        # random pattern tree (sometimes a relabeled subtree of the host)
        k = int(rng.integers(1, 5))
        pv = {i: labels[rng.integers(0, len(labels))] for i in range(k + 1)}
        pe = [
            (int(rng.integers(0, i)), i, elabels[rng.integers(0, len(elabels))])
            for i in range(1, k + 1)
        ]
        dp = subtree_iso_trees(pv, pe, hv, he)
        bt = tree_in_graph(pv, pe, hv, he)
        assert dp == bt, (trial, pv, pe, hv, he)


def test_subtree_iso_positive_embeddings():
    """Every connected edge subset of a tree must be found by both tests."""
    rng = np.random.default_rng(5)
    labels = ["a", "b"]
    for trial in range(40):
        n = int(rng.integers(3, 9))
        hv = {i: labels[rng.integers(0, 2)] for i in range(n)}
        he = [(int(rng.integers(0, i)), i, "e") for i in range(1, n)]
        pats = _tree_subgraph_patterns(hv, he, 3)
        from graphminingtools_ray.functions.cstring import parse_cstring

        for lvl, ps in pats.items():
            for p in ps:
                pv, pe = parse_cstring(p)
                assert subtree_iso_trees(pv, pe, hv, he), (p, hv, he)
                assert tree_in_graph(pv, pe, hv, he), (p, hv, he)


# ---------------------------------------------------------------------------
# ROOTED levelwise mining (round 3, lwgr family) vs an unpruned brute force
# ---------------------------------------------------------------------------

from graphminingtools_ray.algos.subtree_iso import rooted_tree_in_digraph
from graphminingtools_ray.functions.cstring import (
    canonical_rooted_tree_string,
    parse_cstring,
)
from graphminingtools_ray.pipelines.levelwise import levelwise_rooted_mining


def _rooted_subtree_patterns(vlabels, dedges, max_k):
    """All canonical ROOTED-tree strings of out-subtrees with 0..max_k edges
    of a small digraph — independent of the miner: enumerate occurrences by
    growing host out-trees edge by edge from every root."""
    out_adj: dict = {}
    for va, vb, le in dedges:
        out_adj.setdefault(va, []).append((vb, le))
    out = {k: set() for k in range(0, max_k + 1)}
    for v, lab in vlabels.items():
        out[0].add(f"{lab} ")
    seen_occ: set = set()

    def grow(root, tedges, vset):
        k = len(tedges)
        if k:
            pv = {v: vlabels[v] for v in vset}
            s = canonical_rooted_tree_string(pv, list(tedges))
            assert s is not None
            out[k].add(s)
        if k == max_k:
            return
        for u in sorted(vset):
            for w, le in out_adj.get(u, ()):
                if w in vset:
                    continue
                ne = tuple(sorted(tedges + ((u, w, le),)))
                key = (root, ne)
                if key in seen_occ:
                    continue
                seen_occ.add(key)
                grow(root, ne, vset | {w})

    for v in vlabels:
        grow(v, (), frozenset([v]))
    return out


def _rooted_brute_force(sf, max_k, min_support):
    con = duckdb.connect()
    rows = con.execute(f"""
        WITH pl AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_partkey, p_brand
                    FROM read_parquet('{sf}/lineitem.parquet') li
                    JOIN read_parquet('{sf}/part.parquet') p ON l_partkey = p_partkey),
        seq AS (SELECT l_orderkey, l_partkey, p_brand, l_returnflag,
                       lag(l_partkey) OVER w AS pk0, lag(p_brand) OVER w AS b0
                FROM pl WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_returnflag))
        SELECT DISTINCT l_orderkey, pk0, l_partkey, b0, p_brand, l_returnflag
        FROM seq WHERE pk0 IS NOT NULL AND pk0 <> l_partkey
    """).fetchall()
    per_graph: dict = {}
    for o, va, vb, ba, bb, le in rows:
        per_graph.setdefault(o, {"v": {}, "e": set()})
        per_graph[o]["v"][va] = ba
        per_graph[o]["v"][vb] = bb
        per_graph[o]["e"].add((va, vb, le))
    counts: dict = {}
    for o, g in per_graph.items():
        pats = _rooted_subtree_patterns(g["v"], sorted(g["e"]), max_k)
        for k, ps in pats.items():
            for p in ps:
                counts[(k + 1, p)] = counts.get((k + 1, p), 0) + 1
    return pd.DataFrame(
        [(l, p, c) for (l, p), c in counts.items() if c >= min_support],
        columns=["level", "pattern", "support"],
    ).sort_values(["level", "pattern"]).reset_index(drop=True)


def test_levelwise_rooted_matches_bruteforce():
    got = levelwise_rooted_mining(SF, max_edges=3, min_support=2)
    got = got.sort_values(["level", "pattern"]).reset_index(drop=True)
    want = _rooted_brute_force(SF, 3, 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["level"] >= 3).any()  # genuinely beyond single edges


def test_rooted_vs_unrooted_distinction():
    """Direction matters: a chain A-x->B occurs rooted at A only; the rooted
    miner must NOT count B ( x A )."""
    g_v = {0: "A", 1: "B"}
    g_e = [(0, 1, "x")]
    ok = rooted_tree_in_digraph(*parse_cstring("A ( x B ) "), g_v, g_e)
    no = rooted_tree_in_digraph(*parse_cstring("B ( x A ) "), g_v, g_e)
    assert ok and not no
    # branching beats chains: root with two children needs two out-edges
    g2_v = {0: "A", 1: "B", 2: "B"}
    chain = [(0, 1, "x"), (1, 2, "x")]
    star = [(0, 1, "x"), (0, 2, "x")]
    p = parse_cstring("A ( x B ) ( x B ) ")
    assert rooted_tree_in_digraph(*p, g2_v, star)
    assert not rooted_tree_in_digraph(*p, g2_v, chain)


def test_levelwise_tree_mining_operator_registry():
    """The lwg -e registry: mining with the sampled local_easy operator is
    one-sided — every (pattern, support) it reports is bounded by the exact
    subtree-operator support, and level 1 (direct counting) is identical."""
    exact = levelwise_tree_mining(SF, max_edges=2, min_support=2)
    le = levelwise_tree_mining(
        SF, max_edges=2, min_support=2,
        embedding_operator="local_easy_sampled", operator_threshold=1,
    )
    ex = {(r.level, r.pattern): r.support for r in exact.itertuples()}
    for r in le.itertuples():
        assert (r.level, r.pattern) in ex
        assert r.support <= ex[(r.level, r.pattern)]
    # levels 1-2 count directly / via single-edge anchors: identical sets
    assert set(le[le["level"] == 1]["pattern"]) == set(
        exact[exact["level"] == 1]["pattern"]
    )
    # ps (forest-of-sampled-spanning-trees transactions) is one-sided the
    # same way; global_tree_enumeration must reproduce exact verbatim
    ps = levelwise_tree_mining(
        SF, max_edges=2, min_support=2,
        embedding_operator="ps", operator_threshold=4,
    )
    for r in ps.itertuples():
        assert (r.level, r.pattern) in ex
        assert r.support <= ex[(r.level, r.pattern)]
    gte = levelwise_tree_mining(
        SF, max_edges=2, min_support=2,
        embedding_operator="global_tree_enumeration",
    )
    assert gte.equals(exact)
