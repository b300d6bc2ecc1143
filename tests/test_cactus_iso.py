"""Cactus-structured tree-pattern subtree isomorphism
(algos.cactus_iso.tree_in_cactus; reference cactustree.c cactusTreeSubIso)
vs the general backtracking embedding oracle — for tree patterns, subgraph
iso into a cactus IS plain subgraph iso, so tree_in_graph is exact ground
truth; the DP must agree everywhere."""

import random

import pandas as pd

from graphminingtools_ray.algos.cactus_iso import (
    is_cactus_graph,
    tree_in_cactus,
)
from graphminingtools_ray.algos.subtree_iso import tree_in_graph

LAB = "ABC"
ELAB = "xy"


def _random_cactus(rng, n_blocks=4):
    """Grow a cactus: repeatedly attach a bridge or a 3-5-cycle at a random
    existing vertex."""
    vl = {0: rng.choice(LAB)}
    edges = []
    for _ in range(rng.randint(1, n_blocks)):
        at = rng.choice(list(vl))
        if rng.random() < 0.4:
            nid = len(vl)
            vl[nid] = rng.choice(LAB)
            edges.append((at, nid, rng.choice(ELAB)))
        else:
            k = rng.randint(3, 5)
            ids = [at] + [len(vl) + i for i in range(k - 1)]
            for i in ids[1:]:
                vl[i] = rng.choice(LAB)
            for i in range(k):
                edges.append((ids[i], ids[(i + 1) % k], rng.choice(ELAB)))
    return vl, edges


def _random_tree(rng, kmax=5):
    k = rng.randint(1, kmax)
    pv = {i: rng.choice(LAB) for i in range(k)}
    pe = [(rng.randint(0, i - 1), i, rng.choice(ELAB)) for i in range(1, k)]
    return pv, pe


def test_cactus_dp_matches_backtracking_oracle():
    rng = random.Random(5)
    n_pos = 0
    for _ in range(800):
        gv, ge = _random_cactus(rng)
        assert is_cactus_graph(gv, ge)
        pv, pe = _random_tree(rng)
        want = tree_in_graph(pv, pe, gv, ge)
        got = tree_in_cactus(pv, pe, gv, ge)
        assert got == want, (pv, pe, gv, ge)
        n_pos += want
    assert n_pos > 100  # the fuzz actually exercises both answers


def test_cactus_dp_handcrafted():
    # triangle with a pendant: path of 3 edges fits, 3-star does not
    gv = {0: "A", 1: "A", 2: "A", 3: "A"}
    ge = [(0, 1, "x"), (1, 2, "x"), (2, 0, "x"), (0, 3, "x")]
    p3 = ({0: "A", 1: "A", 2: "A", 3: "A"},
          [(0, 1, "x"), (1, 2, "x"), (2, 3, "x")])
    star = ({0: "A", 1: "A", 2: "A", 3: "A"},
            [(0, 1, "x"), (0, 2, "x"), (0, 3, "x")])
    assert tree_in_cactus(*p3, gv, ge)
    assert tree_in_cactus(*star, gv, ge)  # vertex 0: nbrs 1, 2, 3
    # remove the pendant: the star needs 3 distinct neighbors, a triangle
    # vertex has only 2
    assert not tree_in_cactus(*star, {k: v for k, v in gv.items() if k != 3},
                              ge[:3])
    # labels matter
    p_bad = ({0: "A", 1: "B"}, [(0, 1, "x")])
    assert not tree_in_cactus(*p_bad, gv, ge)
    # edge labels matter
    p_el = ({0: "A", 1: "A"}, [(0, 1, "y")])
    assert not tree_in_cactus(*p_el, gv, ge)
    # non-cactus host raises
    import pytest

    k4v = {0: "A", 1: "A", 2: "A", 3: "A"}
    k4e = [(a, b, "x") for a in range(4) for b in range(a + 1, 4)]
    with pytest.raises(ValueError):
        tree_in_cactus(*p3, k4v, k4e)


def test_cactus_pipeline_distributed_matches_local(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.functions.cstring import canonical_tree_string
    from graphminingtools_ray.pipelines.patterns import cactus_pattern_features
    from graphminingtools_ray.sources.generators import block_chain_db

    long_ds = block_chain_db(10, 3, 4, diagonal_prob=0.0, seed=29)
    pats = [
        canonical_tree_string(
            {i: "x" for i in range(k + 1)},
            [(i, i + 1, "x") for i in range(k)],
        )
        for k in (1, 2, 3)
    ]
    out = cactus_pattern_features(long_ds, pats)
    # local oracle over the same long rows
    df = long_ds.to_pandas()
    for gid, g in df.groupby("graph_id"):
        gv = {int(r.a): "x" for r in g.itertuples() if r.kind == "v"}
        ge = [(int(r.a), int(r.b), "x") for r in g.itertuples()
              if r.kind == "e"]
        for p in pats:
            from graphminingtools_ray.functions.cstring import parse_cstring

            want = tree_in_graph(*parse_cstring(p), gv, ge)
            got = out[(out["graph_id"] == gid) & (out["pattern"] == p)]
            assert len(got) == 1 and bool(got["matched"].iloc[0]) == want
