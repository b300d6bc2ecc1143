"""localEasy embedding operator (algos.local_easy; reference
localEasySubtreeIsomorphism.c) — exhaustive mode must equal exact subgraph
iso on ARBITRARY hosts; sampled mode must be sound (one-sided: a match is a
certificate) and deterministic."""

import random

from graphminingtools_ray.algos.local_easy import (
    block_spanning_trees,
    local_easy_match,
)
from graphminingtools_ray.algos.subtree_iso import tree_in_graph

LAB = "ABC"
ELAB = "xy"


def _random_graph(rng, nmax=8):
    n = rng.randint(1, nmax)
    vl = {i: rng.choice(LAB) for i in range(n)}
    pool = [(i, j) for i in range(n) for j in range(i + 1, n)]
    edges = [
        (a, b, rng.choice(ELAB))
        for a, b in rng.sample(pool, rng.randint(0, min(len(pool), 2 * n)))
    ]
    return vl, edges


def _random_tree(rng, kmax=5):
    k = rng.randint(1, kmax)
    pv = {i: rng.choice(LAB) for i in range(k)}
    pe = [(rng.randint(0, i - 1), i, rng.choice(ELAB))
          for i in range(1, k)]
    return pv, pe


def test_exhaustive_mode_is_exact_on_arbitrary_hosts():
    rng = random.Random(11)
    n_pos = 0
    for _ in range(600):
        gv, ge = _random_graph(rng)
        pv, pe = _random_tree(rng)
        want = tree_in_graph(pv, pe, gv, ge)
        got, exhaustive = local_easy_match(pv, pe, gv, ge, exact_cap=300000)
        assert exhaustive
        assert got == want, (pv, pe, gv, ge)
        n_pos += want
    assert n_pos > 80


def test_sampled_mode_is_sound_and_deterministic():
    rng = random.Random(13)
    hits = unsound = 0
    for t in range(400):
        gv, ge = _random_graph(rng)
        pv, pe = _random_tree(rng)
        want = tree_in_graph(pv, pe, gv, ge)
        got1, _ = local_easy_match(pv, pe, gv, ge, k=2, seed=t, exact_cap=2)
        got2, _ = local_easy_match(pv, pe, gv, ge, k=2, seed=t, exact_cap=2)
        assert got1 == got2  # deterministic for fixed seed
        if got1 and not want:
            unsound += 1
        if got1 and want:
            hits += 1
    assert unsound == 0
    assert hits > 50


def test_block_spanning_tree_listing_and_sampling():
    import numpy as np

    rng = np.random.default_rng(3)
    # a 4-cycle block lists exactly its 4 edge-removals
    cyc = [(0, 1, "x"), (1, 2, "y"), (2, 3, "x"), (3, 0, "y")]
    sts, exhaustive = block_spanning_trees(cyc, k=8, rng=rng, exact_cap=64)
    assert exhaustive and len(sts) == 4
    for st in sts:
        assert len(st) == 3  # spanning trees of a 4-vertex block
    # K4 under a tiny cap falls back to sampling: sound trees, deduplicated
    k4 = [(a, b, "x") for a in range(4) for b in range(a + 1, 4)]
    sts, exhaustive = block_spanning_trees(k4, k=10, rng=rng, exact_cap=2)
    assert not exhaustive
    assert 1 <= len(sts) <= 10
    keys = {frozenset((min(a, b), max(a, b)) for a, b, _ in st)
            for st in sts}
    assert len(keys) == len(sts)  # dedup by edge set


def test_poset_localeasy_pipeline_sound(ray_session):
    """static_path_cover poset evaluation with the local_easy operator: its
    matched set must be a SUBSET of the exact subtree-operator set (one-sided
    error), and equal it with a generous k (every block here is tiny)."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.functions.cstring import canonical_tree_string
    from graphminingtools_ray.pipelines.poset_minhash import (
        poset_exact_embeddings,
    )

    rng = random.Random(7)
    rows = []
    for gid in range(8):
        gv, ge = _random_graph(rng)
        for a, b, le in ge:
            rows.append((gid, a, b, gv[a], gv[b], le))
    if not rows:
        return
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
    pats = sorted(
        {
            canonical_tree_string({0: a, 1: b}, [(0, 1, el)])
            for a in LAB
            for b in LAB
            for el in ELAB
        }
    )
    ds = rd.from_arrow(t)
    exact = poset_exact_embeddings(ds, pats, operator="subtree")
    le = poset_exact_embeddings(ds, pats, operator="local_easy_sampled", threshold=2)
    exact_set = set(zip(exact["graph_id"], exact["pattern_id"]))
    le_set = set(zip(le["graph_id"], le["pattern_id"]))
    assert le_set <= exact_set
    le_big = poset_exact_embeddings(
        ds, pats, operator="local_easy", threshold=0
    )
    big_set = set(zip(le_big["graph_id"], le_big["pattern_id"]))
    assert big_set <= exact_set


def test_hops_operator_one_sided():
    """make_match_op('hops'): repeated randomized embedding attempts — a
    match is always a real embedding (the estimator only counts completed
    embeddings); generous trials find most of them on small hosts."""
    from graphminingtools_ray.pipelines.poset_minhash import make_match_op

    op = make_match_op("hops", 64)
    rng = random.Random(19)
    unsound = hits = want_n = 0
    for _ in range(300):
        gv, ge = _random_graph(rng)
        pv, pe = _random_tree(rng, kmax=4)
        want = tree_in_graph(pv, pe, gv, ge)
        got = op(pv, pe, gv, ge)
        want_n += want
        if got and not want:
            unsound += 1
        if got and want:
            hits += 1
    assert unsound == 0
    assert hits >= 0.7 * want_n  # finds the bulk at 64 trials
