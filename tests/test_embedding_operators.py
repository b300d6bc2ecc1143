"""The round-3 completion of the `lwg -e` embedding-operator registry
(reference levelwiseGraphMiningMain.c:102-261): ps (probabilistic tree
sampling over forest transactions), exactGlobalTreeEnumeration,
treeEnumeration (always-true), bps_resampling, and the matching-based HOPS
estimator (FKM/FKF shape). Oracles: exact backtracking subtree iso /
embedding counts; soundness (one-sided) + determinism for the sampled
operators."""

import random

import numpy as np

from graphminingtools_ray.algos.subtree_iso import (
    count_tree_embeddings,
    hops_embedding_estimate_matching,
    tree_in_graph,
)
from graphminingtools_ray.graph.sampling import sampled_spanning_forest
from graphminingtools_ray.pipelines.poset_minhash import make_match_op

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


def test_sampled_spanning_forest_structure():
    rng = random.Random(7)
    for t in range(100):
        gv, ge = _random_graph(rng)
        fv, fe = sampled_spanning_forest(gv, ge, k=4, seed=t)
        # every tree copy preserves labels from the host's label multiset
        host_labels = set(gv.values())
        assert set(fv.values()) <= host_labels
        # forest: edge endpoints exist, and it is acyclic (|E| < |V|, and
        # per construction each copy is a spanning tree of its component)
        assert all(a in fv and b in fv for a, b, _ in fe)
        assert len(fe) < max(len(fv), 1) or len(fv) == 0
        # deterministic
        fv2, fe2 = sampled_spanning_forest(gv, ge, k=4, seed=t)
        assert fv == fv2 and fe == fe2


def test_sampled_forest_of_a_tree_is_the_tree():
    """A tree host has exactly one spanning tree per component, so the k
    samples dedup to one copy and ps == exact for any k >= 1."""
    rng = random.Random(19)
    for t in range(100):
        pv, pe = _random_tree(rng, kmax=7)  # host IS a tree
        fv, fe = sampled_spanning_forest(pv, pe, k=5, seed=t)
        assert len(fv) == len(pv)
        assert len(fe) == len(pe)
        qv, qe = _random_tree(rng)
        assert tree_in_graph(qv, qe, fv, fe) == tree_in_graph(qv, qe, pv, pe)


def test_ps_operator_one_sided():
    """ps matches are certificates of real embeddings; misses may be false
    negatives (one-sided, like the reference's sampled operators)."""
    rng = random.Random(3)
    hits = 0
    for _ in range(300):
        gv, ge = _random_graph(rng)
        pv, pe = _random_tree(rng)
        op = make_match_op("ps", 4)
        got = op(pv, pe, gv, ge)
        if got:
            assert tree_in_graph(pv, pe, gv, ge)
            hits += 1
    assert hits > 40


def test_global_tree_enumeration_equals_exact():
    """exactGlobalTreeEnumeration == exact subtree iso (spanning-tree
    closure argument, lwm_initAndCollect.c:676)."""
    rng = random.Random(5)
    op = make_match_op("global_tree_enumeration", 0)
    diffs = 0
    for _ in range(200):
        gv, ge = _random_graph(rng)
        pv, pe = _random_tree(rng)
        assert op(pv, pe, gv, ge) == tree_in_graph(pv, pe, gv, ge)
        diffs += 1
    assert diffs == 200


def test_tree_enumeration_always_true():
    op = make_match_op("tree_enumeration", 0)
    assert op({0: "A"}, [], {}, [])


def test_local_easy_resampled_sound_and_deterministic():
    rng = random.Random(23)
    hits = 0
    op = make_match_op("local_easy_resampled", 2)
    for _ in range(200):
        gv, ge = _random_graph(rng)
        pv, pe = _random_tree(rng)
        got = op(pv, pe, gv, ge)
        assert got == op(pv, pe, gv, ge)  # per-pattern seed => deterministic
        if got:
            assert tree_in_graph(pv, pe, gv, ge)
            hits += 1
    assert hits > 30


def test_hops_matching_estimator_unbiased():
    """The matching-variant sample mean converges to the exact embedding
    count, like the simple variant (same contract, lower variance)."""
    rng = np.random.default_rng(11)
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
        est = hops_embedding_estimate_matching(
            pv, pe, gv, ge, n_samples=6000, seed=trial
        )
        if exact == 0:
            assert est == 0.0
        else:
            assert abs(est - exact) / exact < 0.35, (trial, exact, est)
            checked += 1
    assert checked >= 10
    a = hops_embedding_estimate_matching(pv, pe, gv, ge, n_samples=100, seed=1)
    b = hops_embedding_estimate_matching(pv, pe, gv, ge, n_samples=100, seed=1)
    assert a == b


def test_hops_matching_star_host_exact_in_one_sample():
    """On a star host embedding a star pattern, the matching variant's
    weight is exactly the permanent (k-permutation count) — every sample
    returns the exact count, unlike the simple variant whose per-sample
    weight varies with pick order."""
    gv = {0: "c", 1: "l", 2: "l", 3: "l", 4: "l"}
    ge = [(0, i, "e") for i in range(1, 5)]
    pv = {0: "c", 1: "l", 2: "l"}
    pe = [(0, 1, "e"), (0, 2, "e")]
    exact = count_tree_embeddings(pv, pe, gv, ge)
    assert exact == 12  # 4 * 3 ordered leaf picks
    est = hops_embedding_estimate_matching(pv, pe, gv, ge, n_samples=3, seed=0)
    assert est == float(exact)
