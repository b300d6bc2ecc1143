"""Spanning-tree samplers, LSH ANN recall, resumable parquet sink,
canonical-string pipeline."""

import numpy as np
import pytest

from graphminingtools_ray.graph.sampling import sample_spanning_trees_per_graph

SF = "/root/testdata/sf0.001"


def _is_spanning_tree(n, tree_edges, graph_edges):
    if len(tree_edges) != n - 1:
        return False
    gset = {(min(a, b), max(a, b)) for a, b in graph_edges}
    parent = list(range(n))

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in tree_edges:
        if (min(a, b), max(a, b)) not in gset:
            return False
        ra, rb = find(a), find(b)
        if ra == rb:
            return False  # cycle
        parent[ra] = rb
    return True


@pytest.mark.parametrize("method", ["wilson", "kruskal"])
def test_spanning_tree_samples_valid(method):
    rng = np.random.default_rng(3)
    for gid in range(5):
        n = int(rng.integers(4, 12))
        # connected: random tree + extra edges
        edges = [(int(rng.integers(0, v)), v) for v in range(1, n)]
        for _ in range(n):
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b:
                edges.append((min(a, b), max(a, b)))
        trees = sample_spanning_trees_per_graph(
            n, edges, graph_id=gid, k=3, method=method
        )
        for t in trees:
            assert _is_spanning_tree(n, t, edges)
    # determinism in (seed, graph_id)
    a = sample_spanning_trees_per_graph(6, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)], 7, k=2)
    b = sample_spanning_trees_per_graph(6, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)], 7, k=2)
    assert a == b


def test_ann_lsh_recall():
    from graphminingtools_ray.pipelines.embeddings_q import ann_topk, ann_topk_lsh

    exact = ann_topk(SF)
    approx = ann_topk_lsh(SF)
    e = {(r.qid, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.qid, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, recall  # multi-probe over 8 planes, random data
    # determinism
    again = ann_topk_lsh(SF)
    assert approx.equals(again)


def test_ingest_to_parquet_resumable(tmp_path):
    import pyarrow.parquet as pq

    from graphminingtools_ray.pipelines.sink import ingest_to_parquet
    from graphminingtools_ray.sources.corpus import CorpusSpec, write_corpus_parquet

    src = str(tmp_path / "corpus.parquet")
    write_corpus_parquet(src, seed=42, spec=CorpusSpec.for_scale("t1"))
    out = str(tmp_path / "ingested")
    m1 = ingest_to_parquet(src, out)
    assert set(m1["row_counts"]) == {"files", "vertices", "edges"}
    assert m1["row_counts"]["files"] == pq.read_table(src).num_rows
    # second run: same digest -> skip (manifest returned unchanged)
    m2 = ingest_to_parquet(src, out)
    assert m1 == m2


def test_order_tree_cstrings():
    from graphminingtools_ray.pipelines.trees import order_tree_cstrings

    df = order_tree_cstrings(SF).to_pandas()
    assert df["n_graphs"].sum() > 0
    # every order is counted exactly once
    import duckdb

    n_orders = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    assert df["n_graphs"].sum() == n_orders
    # chains are paths unless a part repeats: most orders are trees
    no_tree = df[df["cstring"] == "No Tree"]["n_graphs"].sum()
    assert no_tree < n_orders * 0.5
    # canonical strings end with the mandatory trailing space
    assert all(s.endswith(" ") or s == "No Tree" for s in df["cstring"])


@pytest.mark.parametrize(
    "method",
    ["listing", "mix", "partial_listing", "cactus", "list_or_sample"],
)
def test_strategy_samples_are_spanning_trees(method):
    """Round-2 ts strategy suite (sampleSubtrees.c:165-368 dispatch)."""
    rng = np.random.default_rng(11)
    for gid in range(4):
        n = int(rng.integers(4, 10))
        edges = [(int(rng.integers(0, v)), v) for v in range(1, n)]
        for _ in range(n // 2):
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b:
                edges.append((min(a, b), max(a, b)))
        edges = sorted(set(edges))
        trees = sample_spanning_trees_per_graph(
            n, edges, graph_id=gid, k=3, method=method, threshold=50
        )
        for t in trees:
            assert _is_spanning_tree(n, t, edges)


def test_listing_enumerates_exactly():
    from graphminingtools_ray.graph.gdb import measures_for_graph
    from graphminingtools_ray.graph.sampling import (
        enumerate_spanning_trees,
        spanning_tree_upper_bound,
    )

    # K4: 16 spanning trees (Cayley); bound >= exact
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    trees = enumerate_spanning_trees(4, edges)
    assert len(trees) == 16
    assert spanning_tree_upper_bound(4, edges) >= 16
    assert measures_for_graph(4, edges)["spanning_trees"] == 16


def test_cactus_sampler_uniform_blocks():
    """On a cactus, every sample keeps all bridges and drops exactly one
    edge per cycle block (sampleSpanningTreeEdgesFromCactus semantics)."""
    # two triangles joined by a bridge: blocks {0,1,2}, {3,4,5}, bridge 2-3
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    trees = sample_spanning_trees_per_graph(
        6, edges, graph_id=1, k=8, method="cactus"
    )
    for t in trees:
        assert _is_spanning_tree(6, t, edges)
        assert (2, 3) in [(min(a, b), max(a, b)) for a, b in t]


def test_noniso_sampled_matches_bruteforce():
    """listing-strategy iso-class count at saturating k == exact
    non-isomorphic spanning tree count (listSpanningTrees.c:439-463)."""
    from graphminingtools_ray.graph.gdb import measures_for_graph
    from graphminingtools_ray.graph.sampling import (
        noniso_sampled_spanning_trees,
    )

    cases = [
        (4, [(0, 1), (1, 2), (0, 2), (2, 3)]),
        (5, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4), (1, 3)]),
    ]
    for n, edges in cases:
        exact = measures_for_graph(n, edges)["n_noniso_spanning_trees"]
        sampled = noniso_sampled_spanning_trees(
            n, edges, graph_id=3, k=400, method="listing", threshold=10**6
        )
        assert sampled == exact


def test_tree_sampling_measures_pipeline(ray_session):
    from graphminingtools_ray.graph.sampling import tree_sampling_measures
    from graphminingtools_ray.sources.generators import (
        block_chain_db,
        gdb_from_long,
    )

    v, e = gdb_from_long(block_chain_db(6, 2, 4, seed=5))
    out = (
        tree_sampling_measures(v, e, k=3, seed=9)
        .to_pandas()
        .sort_values("graph_id")
        .reset_index(drop=True)
    )
    assert len(out) == 6
    assert (out["noniso_wilson"] >= 1).all()
    # determinism across runs
    out2 = (
        tree_sampling_measures(v, e, k=3, seed=9)
        .to_pandas()
        .sort_values("graph_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_bloom_docking_bits():
    """functions.bloom: one-sided error — a pattern that embeds always
    passes the subset test (bloomFilter.c contract)."""
    from graphminingtools_ray.functions.bloom import (
        docking_bits,
        fingerprint,
        is_subset,
    )

    rng = np.random.default_rng(4)
    for _ in range(50):
        g_elems = rng.integers(0, 1000, size=rng.integers(1, 30))
        sub = rng.choice(g_elems, size=rng.integers(1, len(g_elems) + 1))
        groups, bits = docking_bits(
            np.zeros(len(g_elems), np.int64), g_elems
        )
        assert is_subset(fingerprint(sub), bits)[0]
    # a disjoint element range is (very likely) prunable for small sets
    groups, bits = docking_bits(np.zeros(2, np.int64), np.array([1, 2]))
    assert not is_subset(fingerprint(np.array([5])), bits)[0]


def test_ann_ivf_recall():
    from graphminingtools_ray.pipelines.embeddings_q import ann_topk, ann_topk_ivf

    exact = ann_topk(SF)
    approx = ann_topk_ivf(SF)
    e = {(r.qid, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.qid, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # 8-of-32 probe lists, random data
    # structural sanity: every result obeys the per-query probe restriction
    # implicitly (it came from the masked scores); ranks are 1..k per query
    assert (approx.groupby("qid")["rank"].min() == 1).all()
    # determinism
    again = ann_topk_ivf(SF)
    assert approx.equals(again)


def test_embedding_near_dup_tiled_matches_untiled():
    """Two-level tile fan-out (hot-label skew path) == single-tile path ==
    the SQL oracle's all-pairs semantics: forcing every label into multiple
    chunks (tile_rows below the label sizes) must not change the pair set."""
    from graphminingtools_ray.pipelines.embeddings_q import embedding_near_dup

    base = embedding_near_dup(SF)
    tiled = embedding_near_dup(SF, tile_rows=8)
    tiled_strips = embedding_near_dup(SF, tile_rows=8, chunk_rows=5)
    assert base.equals(tiled)
    assert base.equals(tiled_strips)
