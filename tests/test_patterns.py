"""Pattern-based feature extraction (gpe/tpk/cpk analogs) + libSVM sink."""

import itertools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from graphminingtools_ray.functions.cstring import (
    canonical_cycle,
    canonical_tree_string,
)
from graphminingtools_ray.pipelines.patterns import (
    _bridge_tree_features,
    _cycle_features,
    cyclic_pattern_features,
    pattern_feature_table,
    pattern_gram,
    tree_pattern_features,
)
from graphminingtools_ray.pipelines.sink import write_libsvm

SF = "/root/testdata/sf0.001"


def test_cycle_features_known_graphs():
    # triangle + pendant edge, labeled
    vertices = {0: "a", 1: "b", 2: "c", 3: "d"}
    edges = [(0, 1, "x"), (1, 2, "y"), (0, 2, "z"), (2, 3, "w")]
    cyc = _cycle_features(vertices, edges)
    assert cyc == {canonical_cycle(["a", "b", "c"], ["x", "y", "z"])}
    trees = _bridge_tree_features(vertices, edges)
    assert trees == {canonical_tree_string({2: "c", 3: "d"}, [(2, 3, "w")])}

    # two disjoint cycles of different length
    v2 = {i: "v" for i in range(7)}
    e2 = [(0, 1, "e"), (1, 2, "e"), (2, 0, "e"),
          (3, 4, "e"), (4, 5, "e"), (5, 6, "e"), (6, 3, "e")]
    cyc2 = _cycle_features(v2, e2)
    assert len(cyc2) == 2  # a labeled 3-cycle and a 4-cycle
    assert _bridge_tree_features(v2, e2) == set()


def test_cyclic_pattern_features_deterministic():
    a = cyclic_pattern_features(SF).to_pandas()
    b = cyclic_pattern_features(SF).to_pandas()
    key = ["graph_id", "kind", "feature"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    assert (a["kind"].isin(["cycle", "tree"])).all()
    assert len(a) > 0


def test_pattern_feature_table_vs_subgraph_enumeration():
    """gpe probe vs the independent tree-subgraph enumeration oracle."""
    from graphminingtools_ray.pipelines.mining import order_graph_edges_full

    from .test_levelwise import _tree_subgraph_patterns

    edges_ds = order_graph_edges_full(SF).materialize()
    df = edges_ds.to_pandas()
    # pattern set: the distinct 2-edge trees of the first few graphs
    sample_gids = sorted(df["graph_id"].unique())[:40]
    pats = set()
    per_graph = {}
    for gid in sample_gids:
        g = df[df["graph_id"] == gid]
        vertices = {}
        gedges = set()
        for r in g.itertuples():
            vertices[int(r.va)] = r.ba
            vertices[int(r.vb)] = r.bb
            gedges.add((int(r.va), int(r.vb), r.le))
        subs = _tree_subgraph_patterns(vertices, sorted(gedges), 2)
        per_graph[gid] = subs
        pats |= subs[2]
    pats = sorted(pats)[:25]
    feats = pattern_feature_table(edges_ds, pats).to_pandas()
    feats = feats[feats["graph_id"].isin(sample_gids)]
    got = {(int(r.graph_id), r.pattern) for r in feats.itertuples()}
    want = {
        (gid, p) for gid in sample_gids for p in per_graph[gid][2] if p in set(pats)
    }
    assert got == want


def test_pattern_gram_and_libsvm_sink(tmp_path):
    feats = tree_pattern_features(SF, max_edges=2, min_support=3)
    feats = feats.materialize()
    fdf = feats.to_pandas()
    assert len(fdf) > 0
    ids = sorted(fdf["graph_id"].unique())[:6]
    gram = pattern_gram(feats, ids)
    # symmetry + diagonal = per-graph feature count
    assert (gram.values == gram.values.T).all()
    per = fdf[fdf["graph_id"].isin(ids)].groupby("graph_id")["pattern_id"].nunique()
    for g in ids:
        assert gram.loc[g, g] == per.get(g, 0)

    out = str(tmp_path / "svm")
    n = write_libsvm(feats, out)
    assert n == fdf["graph_id"].nunique()
    lines = []
    for name in sorted(os.listdir(out)):
        with open(os.path.join(out, name)) as fh:
            lines += [l for l in fh.read().splitlines() if l]
    assert len(lines) == n
    for l in lines[:50]:
        parts = l.split()
        assert parts[0] == "0"
        idxs = [int(p.split(":")[0]) for p in parts[1:]]
        assert idxs == sorted(idxs) and all(i >= 1 for i in idxs)


def test_hops_estimator_unbiased():
    """HOPS sample mean converges to the exact embedding count."""
    from graphminingtools_ray.algos.subtree_iso import (
        count_tree_embeddings,
        hops_embedding_estimate,
    )

    rng = np.random.default_rng(4)
    labels = ["a", "b"]
    checked = 0
    for trial in range(25):
        n = int(rng.integers(4, 9))
        gv = {i: labels[rng.integers(0, 2)] for i in range(n)}
        ge = []
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < 0.5:
                    ge.append((i, j, "e"))
        k = int(rng.integers(1, 4))
        pv = {i: labels[rng.integers(0, 2)] for i in range(k + 1)}
        pe = [(int(rng.integers(0, i)), i, "e") for i in range(1, k + 1)]
        exact = count_tree_embeddings(pv, pe, gv, ge)
        est = hops_embedding_estimate(pv, pe, gv, ge, n_samples=6000, seed=trial)
        if exact == 0:
            assert est == 0.0
        else:
            assert abs(est - exact) / exact < 0.35, (trial, exact, est)
            checked += 1
    assert checked >= 10
    # determinism under a fixed seed
    a = hops_embedding_estimate(pv, pe, gv, ge, n_samples=100, seed=1)
    b = hops_embedding_estimate(pv, pe, gv, ge, n_samples=100, seed=1)
    assert a == b


def test_pattern_file_roundtrip_and_probe(ray_session):
    """searchTree.c:972-1061 pattern-table load → broadcast → gpe probe."""
    from graphminingtools_ray.pipelines.levelwise import levelwise_tree_mining
    from graphminingtools_ray.pipelines.mining import order_graph_edges_full
    from graphminingtools_ray.pipelines.patterns import pattern_feature_table
    from graphminingtools_ray.sources.pattern_file import (
        parse_pattern_file,
        write_pattern_file,
    )

    freq = levelwise_tree_mining(SF, max_edges=2, min_support=3)
    pats = [
        (int(s), i, p)
        for i, (p, s) in enumerate(zip(freq["pattern"], freq["support"]))
    ]
    txt = write_pattern_file(pats, transaction_id=7)
    back = parse_pattern_file(txt)
    assert [r["cstring"] for r in back] == [p for _, _, p in pats]
    assert [r["multiplicity"] for r in back] == [m for m, _, _ in pats]
    assert back[0]["transaction_id"] == 7
    # two-column legacy layout gets sequential ids
    legacy = "# 0 2\n3\tA a B\n2\tA a A\n"
    rows = parse_pattern_file(legacy)
    assert [r["pattern_id"] for r in rows] == [0, 1]
    # loaded patterns drive the probe identically to the in-memory list
    feats_file = pattern_feature_table(
        order_graph_edges_full(SF), [r["cstring"] for r in back]
    ).to_pandas()
    feats_mem = pattern_feature_table(
        order_graph_edges_full(SF), [p for _, _, p in pats]
    ).to_pandas()
    key = ["graph_id", "pattern_id"]
    assert feats_file.sort_values(key).reset_index(drop=True).equals(
        feats_mem.sort_values(key).reset_index(drop=True)
    )
