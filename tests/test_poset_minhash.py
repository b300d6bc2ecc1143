"""Min-hashing over the pattern poset (reference minhashing.c) — brute-force
oracles: the poset edges, the shrink invariant, the sketch semantics, the
BFS feature set, and the importance operators of importantSubtrees.c."""

import random

import pandas as pd
import pytest

from graphminingtools_ray.algos.subtree_iso import tree_in_graph
from graphminingtools_ray.functions.cstring import (
    canonical_tree_string,
    parse_cstring,
)
from graphminingtools_ray.pipelines.poset_minhash import (
    TreePoset,
    bfs_feature_set,
    build_evaluation_plan,
    importance_count,
    importance_relative,
    make_match_op,
    minhash_sketch_for_graph,
    positive_border_size,
    poset_minhash_sketches,
    shrink_permutation,
)

# a small downward-closed labeled tree pattern family over labels {A, B}
#   singletons A, B; edges A-e-A, A-e-B; paths of 3; the star A(B,B)


def _cstr(vertices, edges):
    return canonical_tree_string(vertices, edges)


PATTERNS = sorted(
    {
        _cstr({0: "A"}, []),
        _cstr({0: "B"}, []),
        _cstr({0: "A", 1: "A"}, [(0, 1, "e")]),
        _cstr({0: "A", 1: "B"}, [(0, 1, "e")]),
        _cstr({0: "A", 1: "A", 2: "B"}, [(0, 1, "e"), (1, 2, "e")]),
        _cstr({0: "B", 1: "A", 2: "B"}, [(0, 1, "e"), (1, 2, "e")]),
        _cstr({0: "A", 1: "B", 2: "B"}, [(0, 1, "e"), (0, 2, "e")]),
    }
)


def _random_graph(rng, n_max=7):
    n = rng.randint(1, n_max)
    vertices = {i: rng.choice("AB") for i in range(n)}
    edges = []
    pool = [(i, j) for i in range(n) for j in range(i + 1, n)]
    for a, b in rng.sample(pool, rng.randint(0, len(pool))):
        edges.append((a, b, "e"))
    return vertices, edges


def _brute_matched(poset, vertices, edges):
    return {
        pid
        for pid in range(1, poset.n)
        if tree_in_graph(
            poset.vertices[pid - 1], poset.edges[pid - 1], vertices, edges
        )
    }


def test_poset_edges_are_exact_cover_relations():
    """edge p→q ⟺ |V(p)| = |V(q)|−1 and p ⊑ q (brute-force check over all
    pattern pairs, minhashing.c:299-300)."""
    poset = TreePoset(PATTERNS)
    for qid in range(1, poset.n):
        qv, qe = poset.vertices[qid - 1], poset.edges[qid - 1]
        expected = {
            pid
            for pid in range(1, poset.n)
            if len(poset.vertices[pid - 1]) == len(qv) - 1
            and tree_in_graph(
                poset.vertices[pid - 1], poset.edges[pid - 1], qv, qe
            )
        }
        got = {p for p in poset.down[qid] if p != 0}
        assert got == expected, (qid, poset.strings[qid - 1])
        # singletons / minimal patterns hang off the empty pattern
        if not expected:
            assert poset.down[qid] == [0]


def test_shrink_preserves_minhash_pattern():
    """For any downward-closed matched set, the first match in the SHRUNK
    permutation is the same pattern as the first match in the full one
    (posetPermutationMark's correctness claim)."""
    poset = TreePoset(PATTERNS)
    rng = random.Random(3)
    for _ in range(60):
        perm = list(range(1, poset.n))
        rng.shuffle(perm)
        kept = shrink_permutation(perm, poset)
        assert set(kept) <= set(perm)
        vertices, edges = _random_graph(rng)
        matched = _brute_matched(poset, vertices, edges)
        full_first = next((p for p in perm if p in matched), None)
        shrunk_first = next((p for p in kept if p in matched), None)
        assert full_first == shrunk_first


@pytest.mark.parametrize("seed", [1, 7])
def test_sketch_matches_bruteforce(seed):
    poset = TreePoset(PATTERNS)
    plan = build_evaluation_plan(poset, sketch_size=6, seed=seed)
    rng = random.Random(seed)
    saved = 0
    for _ in range(40):
        vertices, edges = _random_graph(rng)
        matched = _brute_matched(poset, vertices, edges)
        sketch, n_eval = minhash_sketch_for_graph(plan, vertices, edges)
        for k in range(6):
            want = next(
                (
                    lvl
                    for lvl, pid in enumerate(plan["shrunk"][k])
                    if pid in matched
                ),
                -1,
            )
            assert sketch[k] == want, (vertices, edges, k)
        assert n_eval <= poset.n - 1
        saved += (poset.n - 1) - n_eval
    # the poset must actually save evaluations vs probing every pattern
    assert saved > 0


def test_bfs_feature_set_and_border():
    poset = TreePoset(PATTERNS)
    rng = random.Random(11)
    for _ in range(40):
        vertices, edges = _random_graph(rng)
        matched = _brute_matched(poset, vertices, edges)
        assert bfs_feature_set(poset, vertices, edges) == matched
        border = positive_border_size(poset, matched)
        want = sum(
            1
            for v in range(poset.n)
            if (v == 0 or v in matched)
            and all(w not in matched for w in poset.up[v])
        )
        assert border == want


def test_importance_operators():
    """importanceCount = #components embedding the pattern
    (importantSubtrees.c:78-102)."""
    # two components: A-e-B and isolated A
    gv = {0: "A", 1: "B", 2: "A"}
    ge = [(0, 1, "e")]
    pv, pe = parse_cstring(_cstr({0: "A"}, []))
    assert importance_count(pv, pe, gv, ge) == 2
    assert importance_relative(pv, pe, gv, ge) == 1.0
    pv2, pe2 = parse_cstring(_cstr({0: "A", 1: "B"}, [(0, 1, "e")]))
    assert importance_count(pv2, pe2, gv, ge) == 1
    assert importance_relative(pv2, pe2, gv, ge) == 0.5
    # threshold operators
    assert make_match_op("abs_importance", 2)(pv, pe, gv, ge)
    assert not make_match_op("abs_importance", 2)(pv2, pe2, gv, ge)
    assert make_match_op("rel_importance", 0.75)(pv, pe, gv, ge)
    assert not make_match_op("rel_importance", 0.75)(pv2, pe2, gv, ge)


def test_importance_sketch_matches_bruteforce():
    """Sketches under the abs-importance operator match a brute force that
    evaluates the operator for every pattern (fastMinHashForAbsImportantTrees
    shape). Monotone: pattern embeds in a component ⇒ subpattern does."""
    poset = TreePoset(PATTERNS)
    plan = build_evaluation_plan(poset, sketch_size=4, seed=5)
    op = make_match_op("abs_importance", 2)
    rng = random.Random(13)
    for _ in range(25):
        vertices, edges = _random_graph(rng)
        matched = {
            pid
            for pid in range(1, poset.n)
            if op(
                poset.vertices[pid - 1], poset.edges[pid - 1], vertices, edges
            )
        }
        sketch, _ = minhash_sketch_for_graph(plan, vertices, edges, op)
        for k in range(4):
            want = next(
                (
                    lvl
                    for lvl, pid in enumerate(plan["shrunk"][k])
                    if pid in matched
                ),
                -1,
            )
            assert sketch[k] == want


def test_distributed_sketches_match_local():
    """The bucketed pipeline over the per-order graph DB equals the local
    per-graph kernel, graph by graph; deterministic in the seed."""
    from graphminingtools_ray.pipelines.levelwise import levelwise_tree_mining
    from graphminingtools_ray.pipelines.mining import order_graph_edges_full

    sf_dir = "/root/testdata/sf0.001"
    frequent = levelwise_tree_mining(sf_dir, max_edges=2, min_support=3)
    patterns = sorted(set(frequent["pattern"].tolist()))
    ds = poset_minhash_sketches(
        order_graph_edges_full(sf_dir), patterns, sketch_size=4, seed=9
    )
    got = ds.to_pandas().sort_values(["graph_id", "perm"]).reset_index(
        drop=True
    )
    assert set(got.columns) == {
        "graph_id", "perm", "sketch_level", "pattern_id", "n_evaluations"
    }

    poset = TreePoset(patterns)
    plan = build_evaluation_plan(poset, sketch_size=4, seed=9)
    edges_df = order_graph_edges_full(sf_dir).to_pandas()
    sample_gids = sorted(got["graph_id"].unique())[:25]
    for gid in sample_gids:
        g = edges_df[edges_df["graph_id"] == gid]
        vertices, edges = {}, []
        for r in g.itertuples():
            vertices[int(r.va)] = r.ba
            vertices[int(r.vb)] = r.bb
            edges.append((int(r.va), int(r.vb), r.le))
        sketch, _ = minhash_sketch_for_graph(plan, vertices, edges)
        rows = got[got["graph_id"] == gid].sort_values("perm")
        assert rows["sketch_level"].tolist() == sketch
        for _, r in rows.iterrows():
            if r["sketch_level"] >= 0:
                assert (
                    plan["shrunk"][int(r["perm"])][int(r["sketch_level"])]
                    == r["pattern_id"]
                )
            else:
                assert r["pattern_id"] == -1


def test_projection_embedding_sound_and_propagated():
    """fullEmbeddingProjectionApproximationForTrees semantics
    (minhashing.c:747-790): every 1 is a true match, every -1 a true
    non-match (vs the brute-force matched set), every projected pattern is
    decided, and explicit evaluations never exceed the projection size."""
    from graphminingtools_ray.pipelines.poset_minhash import (
        projection_embedding_for_graph,
    )

    rng = random.Random(7)
    poset = TreePoset(PATTERNS)
    nrng = __import__("numpy").random.default_rng(7)
    for _ in range(30):
        vertices, edges = _random_graph(rng)
        matched = _brute_matched(poset, vertices, edges)
        k = rng.randint(0, poset.n - 1)
        projection = (nrng.permutation(poset.n - 1)[:k] + 1).tolist()
        emb, n_eval = projection_embedding_for_graph(
            poset, projection, vertices, edges
        )
        assert n_eval <= len(projection)
        for pid in projection:
            assert emb[pid - 1] != 0  # projected patterns are always decided
        for pid in range(1, poset.n):
            v = emb[pid - 1]
            if v == 1:
                assert pid in matched
            elif v == -1:
                assert pid not in matched


def test_distributed_projection_embeddings_match_local():
    """Bucketed pipeline == local kernel per graph; sparse output layout."""
    from graphminingtools_ray.pipelines.levelwise import levelwise_tree_mining
    from graphminingtools_ray.pipelines.mining import order_graph_edges_full
    from graphminingtools_ray.pipelines.poset_minhash import (
        poset_projection_embeddings,
        projection_embedding_for_graph,
    )
    import numpy as np

    sf_dir = "/root/testdata/sf0.001"
    frequent = levelwise_tree_mining(sf_dir, max_edges=2, min_support=3)
    patterns = sorted(set(frequent["pattern"].tolist()))
    ds = poset_projection_embeddings(
        order_graph_edges_full(sf_dir), patterns, projection_size=5, seed=11
    )
    got = ds.to_pandas().sort_values(["graph_id", "pattern_id"]).reset_index(
        drop=True
    )
    assert set(got.columns) == {
        "graph_id", "pattern_id", "value", "n_evaluations"
    }
    assert set(got["value"].unique()) <= {1, -1}

    poset = TreePoset(patterns)
    rng = np.random.default_rng(11)
    projection = (
        rng.permutation(poset.n - 1)[: min(5, poset.n - 1)] + 1
    ).tolist()
    edges_df = order_graph_edges_full(sf_dir).to_pandas()
    for gid in sorted(got["graph_id"].unique())[:20]:
        g = edges_df[edges_df["graph_id"] == gid]
        vertices, edges = {}, []
        for r in g.itertuples():
            vertices[int(r.va)] = r.ba
            vertices[int(r.vb)] = r.bb
            edges.append((int(r.va), int(r.vb), r.le))
        emb, n_eval = projection_embedding_for_graph(
            poset, projection, vertices, edges
        )
        rows = got[got["graph_id"] == gid]
        expect = {
            (pid + 1, int(v)) for pid, v in enumerate(emb) if v != 0
        }
        assert {
            (int(r.pattern_id), int(r.value)) for r in rows.itertuples()
        } == expect
        assert (rows["n_evaluations"] == n_eval).all()


# --- exact full-space embeddings via poset path covers (round 3) -------------

from graphminingtools_ray.pipelines.poset_minhash import (
    exact_embedding_for_graph,
    minimum_path_cover,
    poset_exact_embeddings,
)


def test_minimum_path_cover_is_chain_cover():
    poset = TreePoset(PATTERNS)
    paths = minimum_path_cover(poset)
    seen: list[int] = []
    for path in paths:
        seen.extend(path)
        for a, b in zip(path, path[1:]):
            assert b in poset.up[a]  # consecutive = direct poset edge
    assert sorted(seen) == list(range(1, poset.n))  # vertex-disjoint cover
    # Dilworth bound: cover size equals n_patterns - max matching; for this
    # family the chains genuinely compress (fewer paths than patterns)
    assert len(paths) < poset.n - 1


def test_exact_strategies_match_bruteforce_with_fewer_evaluations():
    poset = TreePoset(PATTERNS)
    paths = minimum_path_cover(poset)
    rng = random.Random(17)
    total_eval = {s: 0 for s in
                  ["static_path_cover", "lattice_path", "dfs_downward", "bfs"]}
    n_graphs = 60
    for _ in range(n_graphs):
        gv, ge = _random_graph(rng)
        want = _brute_matched(poset, gv, ge)
        for strat in total_eval:
            got, n_eval = exact_embedding_for_graph(
                poset, gv, ge, strat,
                paths if strat == "static_path_cover" else None,
            )
            assert got == want, (strat, gv, ge)
            assert n_eval <= poset.n - 1
            total_eval[strat] += n_eval
    # the chain strategies must beat evaluating every pattern every time
    full = n_graphs * (poset.n - 1)
    assert total_eval["static_path_cover"] < full
    assert total_eval["lattice_path"] < full


def test_distributed_exact_embeddings_match_local(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rng = random.Random(23)
    rows = []
    graphs = {}
    for gid in range(12):
        gv, ge = _random_graph(rng)
        if not ge:
            continue
        graphs[gid] = (gv, ge)
        for a, b, le in ge:
            rows.append((gid, a, b, gv[a], gv[b], le))
    t = pa.table(
        {
            "graph_id": pa.array([r[0] for r in rows], pa.int64()),
            "va": pa.array([r[1] for r in rows], pa.int64()),
            "vb": pa.array([r[2] for r in rows], pa.int64()),
            "ba": pa.array([r[3] for r in rows], pa.string()),
            "bb": pa.array([r[4] for r in rows], pa.string()),
            "le": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    out = poset_exact_embeddings(rd.from_arrow(t), PATTERNS)
    poset = TreePoset(PATTERNS)
    for gid, (gv, ge) in graphs.items():
        want = _brute_matched(poset, gv, ge)
        got = set(out[out["graph_id"] == gid]["pattern_id"])
        assert got == want, gid
    # pattern strings round-trip
    for pid, s in zip(out["pattern_id"], out["pattern"]):
        assert poset.strings[pid - 1] == s
