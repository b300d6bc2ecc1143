"""Outerplanar BB-tree kernel (reference opk.c + outerplanar.c:456-641 +
treeKernels.c:91-119) — canonical-string invariance, BB-tree structure on
hand-built graphs, ball enumeration oracles, distributed parity."""

import random

import pandas as pd

from graphminingtools_ray.pipelines.opk import (
    ball_features,
    bb_tree,
    canonical_outerplanar_string,
    opk_features,
    opk_graph_features,
)


def _relabel(block_edges, vlabel, elabel, perm):
    be = [(perm[a], perm[b]) for a, b in block_edges]
    vl = {perm[v]: l for v, l in vlabel.items()}
    el = {
        (min(perm[a], perm[b]), max(perm[a], perm[b])): l
        for (a, b), l in elabel.items()
    }
    return be, vl, el


def _random_op_block(rng):
    """Random biconnected outerplanar block: labeled k-cycle + random
    non-crossing chords."""
    k = rng.randint(3, 8)
    vlabel = {i: rng.choice("ABC") for i in range(k)}
    edges = [(i, (i + 1) % k) for i in range(k)]
    elabel = {
        (min(a, b), max(a, b)): rng.choice("xy") for a, b in edges
    }
    # non-crossing chords via random fan triangulation prefix
    chords = []
    if k >= 4 and rng.random() < 0.8:
        for j in range(2, k - 1):
            if rng.random() < 0.5:
                chords.append((0, j))
    for a, b in chords:
        edges.append((a, b))
        elabel[(a, b)] = rng.choice("xy")
    return edges, vlabel, elabel


def test_canonical_outerplanar_string_invariant_under_relabeling():
    rng = random.Random(3)
    for _ in range(40):
        be, vl, el = _random_op_block(rng)
        s = canonical_outerplanar_string(be, vl, el)
        assert s is not None
        ids = sorted(vl)
        shuffled = ids[:]
        rng.shuffle(shuffled)
        perm = dict(zip(ids, shuffled))
        be2, vl2, el2 = _relabel(be, vl, el, perm)
        assert canonical_outerplanar_string(be2, vl2, el2) == s


def test_canonical_outerplanar_string_separates_structures():
    # triangle vs square, and label-sensitive
    tri = [(0, 1), (1, 2), (0, 2)]
    sq = [(0, 1), (1, 2), (2, 3), (0, 3)]
    el3 = {(min(a, b), max(a, b)): "e" for a, b in tri}
    el4 = {(min(a, b), max(a, b)): "e" for a, b in sq}
    sa = canonical_outerplanar_string(tri, {0: "A", 1: "A", 2: "A"}, el3)
    sb = canonical_outerplanar_string(sq, dict.fromkeys(range(4), "A"), el4)
    sc = canonical_outerplanar_string(tri, {0: "A", 1: "A", 2: "B"}, el3)
    assert len({sa, sb, sc}) == 3


def test_non_outerplanar_block_is_none():
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    el = {(a, b): "e" for a, b in k4}
    assert canonical_outerplanar_string(
        k4, dict.fromkeys(range(4), "A"), el
    ) is None
    # and the whole graph yields no opk features
    vertices = dict.fromkeys(range(4), "A")
    edges = [(a, b, "e") for a, b in k4]
    assert opk_graph_features(vertices, edges) is None


def test_bb_tree_structure_two_triangles_and_pendant():
    """Two triangles sharing vertex 2, pendant edge 4-5: blocks {0,1,2} and
    {2,3,4}; bridge (4,5). Survivors: 2 (two blocks), 4 (bridge+block),
    5 (bridge); 0,1,3 collapse into their blocks."""
    vertices = {0: "A", 1: "A", 2: "B", 3: "A", 4: "A", 5: "C"}
    edges = [
        (0, 1, "e"), (1, 2, "e"), (0, 2, "e"),
        (2, 3, "e"), (3, 4, "e"), (2, 4, "e"),
        (4, 5, "f"),
    ]
    adj, nlabel, block_labels = bb_tree(vertices, edges)
    kept_orig = sorted(v for v in adj if v >= 0)
    assert kept_orig == [2, 4, 5]
    assert len(block_labels) == 2
    assert sorted(v for v in adj if v < 0) == [-2, -1]
    # vertex 2 connects to both block nodes, vertex 4 to one block + bridge
    assert sorted(w for w, _ in adj[2]) == [-2, -1]
    n4 = sorted((w, l) for w, l in adj[4])
    assert (5, "f") in n4 and len(n4) == 2 and n4[0][0] < 0
    assert [w for w, _ in adj[5]] == [4]
    # block nodes carry the triangle canonical strings
    el = {(0, 1): "e", (1, 2): "e", (0, 2): "e"}
    tri_a = canonical_outerplanar_string(
        [(0, 1), (1, 2), (0, 2)], {0: "A", 1: "A", 2: "B"}, el
    )
    assert nlabel[-1] == tri_a or nlabel[-2] == tri_a


def test_ball_features_hand_path():
    """BB-tree that is a labeled path a-b-c: radius-1 and radius-2 balls."""
    adj = {
        0: [(1, "x")],
        1: [(0, "x"), (2, "y")],
        2: [(1, "y")],
    }
    nlabel = {0: "a", 1: "b", 2: "c"}
    feats = ball_features(adj, nlabel, depth=2)
    # roots 0 and 2 emit radii 1,2; root 1 has ecc 1 → radius 1 only
    assert len(feats) == 5
    from graphminingtools_ray.functions.cstring import rooted_cstring

    assert rooted_cstring(1, adj, nlabel) in feats  # root 1 radius-1 ball
    assert feats.count(rooted_cstring(0, adj, nlabel)) == 1  # full from 0


def test_pure_cycle_contributes_block_only():
    vertices = {0: "A", 1: "A", 2: "A", 3: "A"}
    edges = [(0, 1, "e"), (1, 2, "e"), (2, 3, "e"), (0, 3, "e")]
    feats = opk_graph_features(vertices, edges)
    assert feats is not None
    kinds = {k for k, _ in feats}
    assert kinds == {"block"} and len(feats) == 1


def test_distributed_opk_matches_local():
    ds = opk_features("/root/testdata/sf0.001", depth=3)
    got = ds.to_pandas()
    assert set(got.columns) == {"graph_id", "kind", "feature", "count"}
    assert (got["count"] >= 1).all()

    from graphminingtools_ray.pipelines.mining import order_graph_edges_full
    from graphminingtools_ray.pipelines.patterns import _graph_structs

    edges_df = order_graph_edges_full("/root/testdata/sf0.001").to_pandas()
    sample = sorted(got["graph_id"].unique())[:15]
    for gid in sample:
        g = edges_df[edges_df["graph_id"] == gid]
        vertices, gedges = _graph_structs(g)
        fs = opk_graph_features(vertices, gedges, depth=3)
        agg: dict = {}
        for kf in fs:
            agg[kf] = agg.get(kf, 0) + 1
        rows = got[got["graph_id"] == gid]
        assert {
            (r.kind, r.feature): int(r.count) for r in rows.itertuples()
        } == agg


def test_outerplanarity_json_rows():
    """outerplanaritytest JSON shape: cycles are true Hamiltonian cycles of
    their blocks, isOuterplanar matches the gdb measure, non-outerplanar
    graphs may still list cycles of their outerplanar blocks."""
    import json

    import ray.data as rd

    from graphminingtools_ray.pipelines.opk import outerplanarity_json_rows

    rows = []
    # graph 1: two triangles sharing a vertex (outerplanar, 2 cycles)
    tri2 = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    rows += [
        {"graph_id": 1, "va": a, "ba": "A", "vb": b, "bb": "A", "le": "e"}
        for a, b in tri2
    ]
    # graph 2: K4 plus a pendant triangle at vertex 0 (NOT outerplanar, but
    # the triangle block still yields a cycle)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g2 = k4 + [(0, 4), (4, 5), (0, 5)]
    rows += [
        {"graph_id": 2, "va": a, "ba": "A", "vb": b, "bb": "A", "le": "e"}
        for a, b in g2
    ]
    ds = outerplanarity_json_rows(rd.from_items(rows))
    got = {
        int(r["graph_id"]): json.loads(r["json"])
        for r in ds.to_pandas().to_dict("records")
    }
    assert got[1]["isOuterplanar"] is True
    assert got[2]["isOuterplanar"] is False
    assert len(got[1]["hamiltonianCycles"]) == 2
    assert sorted(
        sorted(c) for c in got[1]["hamiltonianCycles"].values()
    ) == [[0, 1, 2], [2, 3, 4]]
    # K4 block yields no cycle; the pendant triangle block does
    g2_cycles = list(got[2]["hamiltonianCycles"].values())
    assert len(g2_cycles) == 1 and sorted(g2_cycles[0]) == [0, 4, 5]
    # cycles are genuine cycles of the graph: consecutive pairs are edges
    eset = {(min(a, b), max(a, b)) for a, b in tri2}
    for cyc in got[1]["hamiltonianCycles"].values():
        k = len(cyc)
        for i in range(k):
            a, b = cyc[i], cyc[(i + 1) % k]
            assert (min(a, b), max(a, b)) in eset
