"""Property-based tests (hypothesis) over the pure per-graph kernels —
relations between measures that must hold for EVERY graph, mirroring the
reference's invariants (Euler relations, block decomposition arithmetic,
canonical-form invariance)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from graphminingtools_ray.functions.cstring import canonical_tree_string
from graphminingtools_ray.graph.gdb import measures_for_graph


@st.composite
def small_graph(draw):
    n = draw(st.integers(min_value=0, max_value=10))
    m = draw(st.integers(min_value=0, max_value=20))
    edges = [
        (draw(st.integers(0, max(0, n - 1))), draw(st.integers(0, max(0, n - 1))))
        for _ in range(m)
    ] if n > 0 else []
    return n, edges


@settings(max_examples=150, deadline=None)
@given(small_graph())
def test_measure_invariants(g):
    n, edges = g
    r = measures_for_graph(n, edges)
    # Euler-ish: for any graph, components >= n - m (each edge merges <= 1)
    assert r["n_components"] >= n - r["m"]
    assert 0 <= r["n_components"] <= max(n, 0)
    # tree iff connected & m == n-1 & simple-ish (no self loops)
    if r["is_tree"]:
        assert r["connected"] and r["m"] == n - 1 and r["n_self_loops"] == 0
        assert r["spanning_trees"] == 1
        assert r["n_simple_cycles"] == 0
    if r["is_path"]:
        assert r["is_tree"] and r["max_degree"] <= 2
    # block decomposition: bridges + blocks partition the non-loop edges'
    # biconnected components; a forest has only bridges
    assert r["n_bridges"] >= 0 and r["n_blocks"] >= 0
    if r["n_simple_cycles"] == 0:
        # acyclic simple graph: no block can exist unless parallel edges made one
        pass
    # cactus implies connected
    if r["is_cactus"]:
        assert r["connected"]
    # degrees bound
    if n > 0:
        assert r["min_degree"] <= r["max_degree"] <= 2 * r["m"]


@settings(max_examples=100, deadline=None)
@given(small_graph())
def test_measures_invariant_under_edge_order(g):
    n, edges = g
    a = measures_for_graph(n, edges)
    b = measures_for_graph(n, list(reversed(edges)))
    assert a == b


@st.composite
def labeled_tree(draw):
    n = draw(st.integers(min_value=1, max_value=9))
    labels = {v: draw(st.sampled_from(["a", "b", "c"])) for v in range(n)}
    edges = [
        (draw(st.integers(0, v - 1)), v, draw(st.sampled_from(["x", "y"])))
        for v in range(1, n)
    ]
    return labels, edges


@settings(max_examples=100, deadline=None)
@given(labeled_tree(), st.randoms(use_true_random=False))
def test_cstring_permutation_invariant(t, rnd):
    labels, edges = t
    n = len(labels)
    base = canonical_tree_string(labels, edges)
    assert base is not None and base.endswith(" ")
    perm = list(range(n))
    rnd.shuffle(perm)
    l2 = {perm[v]: lab for v, lab in labels.items()}
    e2 = [(perm[v], perm[w], el) for v, w, el in edges]
    rnd.shuffle(e2)
    assert canonical_tree_string(l2, e2) == base
