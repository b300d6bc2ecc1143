"""North-star algorithms on the hand-written micro-graphs (FIXTURES.md §3)."""

import numpy as np
import pytest

from graphminingtools_ray.algos import (
    connected_components,
    pagerank,
    triangle_counts,
    wl_relabel,
)
from graphminingtools_ray.graph import symmetrize

from .conftest import PATH4, SELFLOOP_DUP, STAR_HUB, TRI3, TWO_COMP, edges_ds
from .oracles import cc_oracle, pagerank_oracle, triangles_oracle, wl_oracle

GRAPHS = {
    "tri3": TRI3,
    "two_comp": TWO_COMP,
    "star_hub": STAR_HUB,
    "path4": PATH4,
    "selfloop_dup": SELFLOOP_DUP,
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_matches_oracle(name):
    # PageRank is defined on the simple symmetric graph (multigraph edges and
    # self-loops are an ingest policy, handled in simple_undirected)
    from graphminingtools_ray.algos.triangles import simple_undirected

    pairs = GRAPHS[name]
    # fixed iteration count on both sides: engine and oracle follow the same
    # arithmetic path, so agreement is ~1e-15 regardless of convergence state
    ids, r, info = pagerank(
        symmetrize(simple_undirected(edges_ds(pairs))), tol=0.0, max_iter=15
    )
    pairs_simple = [(s, d) for s, d in np.asarray(pairs).reshape(-1, 2) if s != d]
    oids, orr = pagerank_oracle(pairs_simple, tol=0.0, max_iter=15, directed=False)
    assert np.array_equal(ids, oids)
    np.testing.assert_allclose(r, orr, atol=1e-9)
    assert abs(r.sum() - 1.0) < 1e-9  # mass conservation


def test_pagerank_converges_tri3():
    ids, r, info = pagerank(symmetrize(edges_ds(TRI3)), tol=1e-6)
    assert info["converged"]
    np.testing.assert_allclose(r, np.full(3, 1 / 3), atol=1e-9)


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_matches_oracle(name):
    pairs = GRAPHS[name]
    ids, labels, info = connected_components(symmetrize(edges_ds(pairs)))
    oids, olabels = cc_oracle(pairs)
    assert np.array_equal(ids, oids)
    assert np.array_equal(labels, olabels)
    assert info["converged"]


def test_cc_isolated_vertex():
    # reference keeps isolated vertices as their own component
    ids, labels, _ = connected_components(
        symmetrize(edges_ds(TWO_COMP)), all_vertex_ids=np.array([9], dtype=np.int64)
    )
    oids, olabels = cc_oracle(TWO_COMP, extra_vertices=[9])
    assert np.array_equal(ids, oids)
    assert np.array_equal(labels, olabels)


def test_cc_empty():
    ids, labels, _ = connected_components(edges_ds([]).filter(lambda r: False))
    assert len(ids) == 0 and len(labels) == 0


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_wl_matches_oracle(name):
    pairs = GRAPHS[name]
    # WL runs on the simple symmetric graph: self-loops/dups removed first
    from graphminingtools_ray.algos.triangles import simple_undirected

    simple = simple_undirected(edges_ds(pairs))
    ids, labels, _ = wl_relabel(symmetrize(simple), iterations=2)
    pairs_simple = [(s, d) for s, d in np.asarray(pairs).reshape(-1, 2) if s != d]
    oids, olabels = wl_oracle(pairs_simple, iterations=2)
    assert np.array_equal(ids, oids)
    assert list(labels) == list(olabels)


def test_wl_path4_ends_vs_middle():
    from graphminingtools_ray.algos.triangles import simple_undirected

    ids, labels, _ = wl_relabel(symmetrize(simple_undirected(edges_ds(PATH4))))
    lab = dict(zip(ids.tolist(), labels.tolist()))
    # after 1 iter: ends (degree 1) differ from middles (degree 2)
    assert lab[0] != lab[1]
    assert len({lab[0], lab[1], lab[2], lab[3]}) >= 2


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_triangles_match_oracle(name):
    pairs = GRAPHS[name]
    ids, per_vertex, total = triangle_counts(edges_ds(pairs))
    pairs_simple = [(s, d) for s, d in np.asarray(pairs).reshape(-1, 2) if s != d]
    oids, opv, ototal = triangles_oracle(pairs_simple)
    assert np.array_equal(ids, oids)
    assert np.array_equal(per_vertex, opv)
    assert total == ototal


def test_triangles_tri3_exact():
    ids, per_vertex, total = triangle_counts(edges_ds(TRI3))
    assert total == 1
    assert per_vertex.tolist() == [1, 1, 1]


def test_triangles_star_zero():
    _, per_vertex, total = triangle_counts(edges_ds(STAR_HUB))
    assert total == 0
    assert per_vertex.sum() == 0


def test_triangles_dense_equals_partitioned(monkeypatch):
    """The density-adaptive probe (V×V bitmap vs partitioned key index)
    must count bit-identically — GRAFT_TRI_DENSE_V=0 forces the scale
    path on the same seeded random graph."""
    import random

    rng = random.Random(11)
    n = 60
    pairs = sorted(
        {(a, b) for a, b in (sorted(rng.sample(range(n), 2)) for _ in range(400))}
    )
    ids_d, pv_d, tot_d = triangle_counts(edges_ds(pairs))  # dense (V=60)
    monkeypatch.setenv("GRAFT_TRI_DENSE_V", "0")
    ids_p, pv_p, tot_p = triangle_counts(edges_ds(pairs))
    assert np.array_equal(ids_d, ids_p)
    assert np.array_equal(pv_d, pv_p)
    assert tot_d == tot_p > 0


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_lpa_matches_oracle(name):
    from graphminingtools_ray.algos import label_propagation
    from .oracles import lpa_oracle

    pairs = GRAPHS[name]
    ids, labels, info = label_propagation(
        symmetrize(edges_ds(pairs)), max_iter=10
    )
    oids, olabels = lpa_oracle(pairs, max_iter=10)
    assert np.array_equal(ids, oids)
    assert np.array_equal(labels, olabels)


def test_lpa_random_graphs_match_oracle():
    """Seeded ER graphs at several densities (multi-partition path) — the
    engine's vote/tie-break rule must match the brute-force oracle exactly,
    iteration by iteration to the same fixpoint."""
    from graphminingtools_ray.algos import label_propagation
    from .oracles import lpa_oracle

    rng = np.random.default_rng(7)
    for n, m in [(30, 40), (60, 90), (50, 200)]:
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        ]
        ids, labels, _ = label_propagation(
            symmetrize(edges_ds(pairs)), max_iter=8, num_state_partitions=4
        )
        oids, olabels = lpa_oracle(pairs, max_iter=8)
        assert np.array_equal(ids, oids)
        assert np.array_equal(labels, olabels)


def test_lpa_two_communities():
    """Two dense 4-cliques joined by one bridge edge: LPA assigns one label
    per clique (the min id of each clique)."""
    from graphminingtools_ray.algos import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = c1 + c2 + [(3, 10)]
    ids, labels, info = label_propagation(symmetrize(edges_ds(pairs)))
    lab = dict(zip(ids.tolist(), labels.tolist()))
    assert info["converged"]
    assert len({lab[v] for v in range(4)}) == 1
    assert len({lab[v] for v in range(10, 14)}) == 1
    assert lab[0] != lab[10]


def test_lpa_isolated_vertex_keeps_label():
    from graphminingtools_ray.algos import label_propagation

    ids, labels, _ = label_propagation(
        symmetrize(edges_ds(TWO_COMP)),
        all_vertex_ids=np.array([99], dtype=np.int64),
    )
    lab = dict(zip(ids.tolist(), labels.tolist()))
    assert lab[99] == 99


def test_lpa_first_superstep_reduction_unit():
    """_reduce_first_votes keeps exactly: all count>1 entries + per-dst min
    count-1 label — and drops everything else."""
    import numpy as np

    from graphminingtools_ray.algos.labelprop import _reduce_first_votes

    d = np.array([0, 0, 0, 1, 1, 2], dtype=np.int64)
    l = np.array([3, 5, 9, 2, 7, 4], dtype=np.int64)
    c = np.array([1, 2, 1, 1, 1, 1], dtype=np.int64)
    rd_, rl, rc = _reduce_first_votes(d, l, c)
    got = set(zip(rd_.tolist(), rl.tolist(), rc.tolist()))
    # dst 0: keep (5,2) count>1 and min count-1 label 3; drop (9,1)
    # dst 1: keep min count-1 label 2; drop (7,1). dst 2: keep (4,1)
    assert got == {(0, 3, 1), (0, 5, 2), (1, 2, 1), (2, 4, 1)}
    e = np.empty(0, np.int64)
    assert all(len(x) == 0 for x in _reduce_first_votes(e, e, e))


def test_lpa_multiedge_graph_matches_bruteforce(ray_session):
    """Multi-edges make superstep-0 counts exceed 1 inside a cell; the
    reduction must stay exact (winner rule over true multiplicities)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos.labelprop import label_propagation

    rng = np.random.default_rng(7)
    n = 40
    a = rng.integers(0, n, 300)
    b = rng.integers(0, n, 300)
    m = a != b
    a, b = a[m], b[m]
    # duplicate a third of the edges to force count>1 votes
    a = np.concatenate([a, a[::3]])
    b = np.concatenate([b, b[::3]])
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    ids, labels, info = label_propagation(edges, max_iter=7)
    # brute-force synchronous LPA with multiplicities
    lab = {int(v): int(v) for v in np.unique(src)}
    for _ in range(info["iterations"]):
        nxt = {}
        for v in lab:
            votes: dict = {lab[v]: 1}  # self vote
            for s, t in zip(src, dst):
                if int(t) == v:
                    votes[lab[int(s)]] = votes.get(lab[int(s)], 0) + 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lab = nxt
    want = np.array([lab[int(v)] for v in ids])
    assert (labels == want).all()


def _kcore_bruteforce(pairs, k):
    """Sequential peeling oracle: repeatedly delete vertices with degree < k
    in the surviving simple undirected graph."""
    import itertools

    edges = {tuple(sorted((int(a), int(b)))) for a, b in pairs if a != b}
    alive = set(itertools.chain.from_iterable(edges))
    verts = sorted(alive)
    while True:
        deg = {v: 0 for v in alive}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        dead = {v for v in alive if deg[v] < k}
        if not dead:
            break
        alive -= dead
    return np.array(verts, np.int64), np.array(
        [1 if v in alive else 0 for v in verts], np.int64
    )


@pytest.mark.parametrize("name", sorted(GRAPHS))
@pytest.mark.parametrize("k", [1, 2, 3])
def test_kcore_matches_bruteforce_micro(name, k):
    from graphminingtools_ray.algos.kcore import k_core
    from graphminingtools_ray.algos.triangles import simple_undirected

    pairs = GRAPHS[name]
    ids, flags, info = k_core(
        symmetrize(simple_undirected(edges_ds(pairs))), k=k
    )
    oids, oflags = _kcore_bruteforce(pairs, k)
    assert np.array_equal(ids, oids)
    assert np.array_equal(flags, oflags)
    assert info["converged"]


def test_kcore_random_graphs_match_bruteforce():
    """Seeded ER graphs through the multi-partition path: the synchronous
    distributed peel equals sequential peeling (both reach the unique
    maximal k-core)."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos.kcore import k_core
    from graphminingtools_ray.algos.triangles import simple_undirected
    from graphminingtools_ray.graph import symmetrize as symz

    rng = np.random.default_rng(13)
    for trial, k in [(0, 2), (1, 3), (2, 4)]:
        n = 60
        a = rng.integers(0, n, 420)
        b = rng.integers(0, n, 420)
        m = a != b
        pairs = list(zip(a[m].tolist(), b[m].tolist()))
        edges = rd.from_arrow(pa.table({
            "src": np.array([p[0] for p in pairs], np.int64),
            "dst": np.array([p[1] for p in pairs], np.int64),
        }))
        ids, flags, info = k_core(
            symz(simple_undirected(edges)), k=k, num_state_partitions=4
        )
        oids, oflags = _kcore_bruteforce(pairs, k)
        assert np.array_equal(ids, oids), (trial, k)
        assert np.array_equal(flags, oflags), (trial, k)


def _bfs_bruteforce(pairs, source=None):
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    verts = sorted(adj)
    if source is None:
        source = verts[0]
    dist = {source: 0}
    frontier = [source]
    r = 0
    while frontier:
        r += 1
        nxt = []
        for v in frontier:
            for w in adj[v]:
                if w not in dist:
                    dist[w] = r
                    nxt.append(w)
        frontier = nxt
    return np.array(verts, np.int64), np.array(
        [dist.get(v, -1) for v in verts], np.int64
    )


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_sssp_matches_bruteforce_micro(name):
    from graphminingtools_ray.algos.sssp import sssp_hops
    from graphminingtools_ray.algos.triangles import simple_undirected

    pairs = GRAPHS[name]
    ids, dist, info = sssp_hops(
        symmetrize(simple_undirected(edges_ds(pairs)))
    )
    oids, odist = _bfs_bruteforce(pairs)
    assert np.array_equal(ids, oids)
    assert np.array_equal(dist, odist)
    assert info["converged"]


def test_sssp_random_graphs_match_bruteforce():
    """Seeded sparse ER graphs (disconnected, so the -1 path is exercised)
    through the multi-partition path."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos.sssp import sssp_hops
    from graphminingtools_ray.algos.triangles import simple_undirected
    from graphminingtools_ray.graph import symmetrize as symz

    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 80
        a = rng.integers(0, n, 90)
        b = rng.integers(0, n, 90)
        m = a != b
        pairs = list(zip(a[m].tolist(), b[m].tolist()))
        edges = rd.from_arrow(pa.table({
            "src": np.array([p[0] for p in pairs], np.int64),
            "dst": np.array([p[1] for p in pairs], np.int64),
        }))
        ids, dist, info = sssp_hops(
            symz(simple_undirected(edges)), num_state_partitions=4
        )
        oids, odist = _bfs_bruteforce(pairs)
        assert np.array_equal(ids, oids), trial
        assert np.array_equal(dist, odist), trial
        assert (dist == -1).any() or info["converged"]


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_ppr_matches_numpy_oracle(name):
    """Seed-restart power iteration vs a dense numpy oracle following the
    same arithmetic path (fixed k, (1-d)t + d·A^T D^-1 r)."""
    from graphminingtools_ray.algos.ppr import personalized_pagerank
    from graphminingtools_ray.algos.triangles import simple_undirected

    pairs = GRAPHS[name]
    ids_all = sorted({int(v) for p in pairs for v in p if p[0] != p[1]})
    seeds = np.array(ids_all[:2], np.int64)
    ids, r, info = personalized_pagerank(
        symmetrize(simple_undirected(edges_ds(pairs))), seeds, k=7,
        num_state_partitions=4,
    )
    # dense oracle on the simple symmetric graph
    n = len(ids_all)
    pos = {v: i for i, v in enumerate(ids_all)}
    A = np.zeros((n, n))
    for a, b in {tuple(sorted((int(x), int(y)))) for x, y in pairs if x != y}:
        A[pos[a], pos[b]] = A[pos[b], pos[a]] = 1.0
    outdeg = A.sum(axis=1)
    t = np.isin(np.array(ids_all), seeds).astype(float) / len(seeds)
    rr = t.copy()
    for _ in range(7):
        rr = 0.15 * t + 0.85 * (A.T @ (rr / np.maximum(outdeg, 1)))
    assert np.array_equal(ids, np.array(ids_all))
    np.testing.assert_allclose(r, rr, atol=1e-12)
    # restart mass conservation: total rank sums to 1 (no dangling)
    assert abs(r.sum() - 1.0) < 1e-9


def test_pagerank_weighted_matches_numpy_oracle():
    """Weighted PageRank (contribution w*r/W, W = weighted out-degree) vs a
    dense numpy oracle on a seeded weighted graph through the
    multi-partition path."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos import pagerank
    from graphminingtools_ray.graph import symmetrize as symz

    rng = np.random.default_rng(31)
    n = 25
    a = rng.integers(0, n, 80)
    b = rng.integers(0, n, 80)
    m = a != b
    a, b = a[m], b[m]
    key = a * n + b
    _, idx = np.unique(key, return_index=True)
    a, b = a[idx], b[idx]
    w = rng.integers(1, 9, len(a)).astype(np.float64)
    edges = rd.from_arrow(pa.table({
        "src": a.astype(np.int64), "dst": b.astype(np.int64), "weight": w,
    }))
    ids, r, info = pagerank(
        symz(edges), tol=0.0, max_iter=9, weighted=True,
        num_state_partitions=4,
    )
    verts = np.unique(np.concatenate([a, b]))
    pos = {int(v): i for i, v in enumerate(verts)}
    nv = len(verts)
    A = np.zeros((nv, nv))
    for s, d, ww in zip(a, b, w):
        A[pos[int(s)], pos[int(d)]] += ww
        A[pos[int(d)], pos[int(s)]] += ww
    W = A.sum(axis=1)
    rr = np.full(nv, 1.0 / nv)
    for _ in range(9):
        rr = 0.15 / nv + 0.85 * (A.T @ (rr / W))
    assert np.array_equal(ids, verts)
    np.testing.assert_allclose(r, rr, atol=1e-12)


def test_edge_common_neighbors_match_bruteforce():
    """Per-edge triangle support on seeded ER graphs vs a set-intersection
    oracle (common neighbors of each edge's endpoints)."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.pipelines.linkpred import edge_common_neighbors

    rng = np.random.default_rng(41)
    for trial in range(3):
        n = 45
        a = rng.integers(0, n, 320)
        b = rng.integers(0, n, 320)
        m = a != b
        pairs = {tuple(sorted((int(x), int(y))))
                 for x, y in zip(a[m], b[m])}
        edges = rd.from_arrow(pa.table({
            "src": np.array([p[0] for p in pairs], np.int64),
            "dst": np.array([p[1] for p in pairs], np.int64),
        }))
        cn_ds, _ = edge_common_neighbors(edges, num_buckets=8)
        got = {(int(r["u"]), int(r["v"])): int(r["cn"])
               for r in cn_ds.to_pandas().to_dict("records")}
        adj = collections.defaultdict(set)
        for u, v in pairs:
            adj[u].add(v)
            adj[v].add(u)
        want = {}
        for u, v in pairs:
            c = len(adj[u] & adj[v])
            if c:
                want[(u, v)] = c
        assert got == want, trial


def test_harmonic_centrality_exact_integer_sums():
    """The LCM-scaled integer harmonic sums equal brute-force BFS sums on a
    seeded disconnected graph (exercises unreachable + self exclusion)."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos.partitioned import (
        build_partitioned_graph,
    )
    from graphminingtools_ray.algos.sssp import (
        sssp_hops_partitioned,
        state_to_arrays,
    )
    from graphminingtools_ray.pipelines.graph_queries import _HARMONIC_LCM

    rng = np.random.default_rng(47)
    n = 50
    a = rng.integers(0, n, 70)
    b = rng.integers(0, n, 70)
    m = a != b
    pairs = sorted({tuple(sorted((int(x), int(y))))
                    for x, y in zip(a[m], b[m])})
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    sym = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    verts = sorted({v for p in pairs for v in p})
    seeds = verts[:3]
    g = build_partitioned_graph(sym, P=4)
    hc = None
    ids = None
    for s in seeds:
        state_ds, _, _ = sssp_hops_partitioned(sym, source=s, graph=g)
        sids, d = state_to_arrays(state_ds, g)
        d = d.astype(np.int64)
        if hc is None:
            ids, hc = sids, np.zeros(len(sids), np.int64)
        reach = (d > 0) & (d < 41)
        hc[reach] += _HARMONIC_LCM // d[reach]
    oids, want = None, {}
    for s in seeds:
        od, odist = _bfs_bruteforce(pairs, source=s)
        oids = od
        for v, dd in zip(od, odist):
            if 0 < dd <= 40:
                want[int(v)] = want.get(int(v), 0) + _HARMONIC_LCM // int(dd)
    assert np.array_equal(ids, oids)
    assert np.array_equal(hc, np.array([want.get(int(v), 0) for v in ids]))


def _brandes_bruteforce(pairs, sources):
    """Pure-Python Brandes (2001) dependency accumulation per source."""
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    verts = sorted(adj)
    bc = {v: 0.0 for v in verts}
    for s in sources:
        stack = []
        pred = {v: [] for v in verts}
        sigma = {v: 0.0 for v in verts}
        dist = {v: -1 for v in verts}
        sigma[s] = 1.0
        dist[s] = 0
        queue = collections.deque([s])
        while queue:
            v = queue.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in verts}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return np.array(verts, np.int64), np.array([bc[v] for v in verts])


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_betweenness_matches_brandes_micro(name):
    from graphminingtools_ray.algos.betweenness import betweenness_sampled
    from graphminingtools_ray.algos.triangles import simple_undirected

    pairs = [(a, b) for a, b in GRAPHS[name] if a != b]
    verts = sorted({v for p in pairs for v in p})
    ids, bc, info = betweenness_sampled(
        symmetrize(simple_undirected(edges_ds(pairs))),
        np.array(verts, np.int64),  # every vertex -> exact betweenness
    )
    oids, obc = _brandes_bruteforce(pairs, verts)
    assert np.array_equal(ids, oids)
    np.testing.assert_allclose(bc, obc, atol=1e-9)


def test_betweenness_random_graphs_match_brandes():
    """Seeded sparse ER graphs (disconnected) with a source subset through
    the multi-partition path."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos.betweenness import betweenness_sampled
    from graphminingtools_ray.algos.triangles import simple_undirected
    from graphminingtools_ray.graph import symmetrize as symz

    rng = np.random.default_rng(61)
    for trial in range(2):
        n = 45
        a = rng.integers(0, n, 110)
        b = rng.integers(0, n, 110)
        m = a != b
        pairs = sorted({tuple(sorted((int(x), int(y))))
                        for x, y in zip(a[m], b[m])})
        verts = sorted({v for p in pairs for v in p})
        sources = verts[:5]
        edges = rd.from_arrow(pa.table({
            "src": np.array([p[0] for p in pairs], np.int64),
            "dst": np.array([p[1] for p in pairs], np.int64),
        }))
        ids, bc, _ = betweenness_sampled(
            symz(simple_undirected(edges)),
            np.array(sources, np.int64), num_state_partitions=4,
        )
        oids, obc = _brandes_bruteforce(pairs, sources)
        assert np.array_equal(ids, oids), trial
        np.testing.assert_allclose(bc, obc, atol=1e-9)


def _truss_bruteforce(pairs, k):
    """Sequential truss peel: drop edges with in-subgraph triangle support
    < k-2 until stable."""
    edges = {tuple(sorted((int(a), int(b)))) for a, b in pairs if a != b}
    while True:
        import collections

        adj = collections.defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
        dead = {e for e, s in sup.items() if s < k - 2}
        if not dead:
            return edges
        edges -= dead


@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss_matches_bruteforce(k):
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.pipelines.linkpred import k_truss

    rng = np.random.default_rng(67)
    n = 40
    a = rng.integers(0, n, 260)
    b = rng.integers(0, n, 260)
    m = a != b
    pairs = sorted({tuple(sorted((int(x), int(y))))
                    for x, y in zip(a[m], b[m])})
    edges = rd.from_arrow(pa.table({
        "src": np.array([p[0] for p in pairs], np.int64),
        "dst": np.array([p[1] for p in pairs], np.int64),
    }))
    truss, info = k_truss(edges, k=k, num_buckets=8)
    got = {(int(r["src"]), int(r["dst"]))
           for r in truss.to_pandas().to_dict("records")}
    want = _truss_bruteforce(pairs, k)
    assert got == want, (k, len(got), len(want))


def test_random_walks_follow_edges_and_seed_rule():
    """Walks are valid (every consecutive pair is an edge) and each hop
    matches the md5-seeded index rule on the dst-sorted neighbor list;
    two runs are bit-identical."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.graph.walks import random_walks
    from graphminingtools_ray.stages.dedup_md5 import md5_u64_one

    rng = np.random.default_rng(71)
    n = 30
    a = rng.integers(0, n, 120)
    b = rng.integers(0, n, 120)
    m = a != b
    pairs = sorted({tuple(sorted((int(x), int(y))))
                    for x, y in zip(a[m], b[m])})
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    sym = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    def collect(ds):
        return (ds.to_pandas().sort_values(["walk_id", "step"])
                .reset_index(drop=True))

    w1 = collect(random_walks(sym, length=5, num_buckets=4))
    w2 = collect(random_walks(sym, length=5, num_buckets=4))
    assert w1.equals(w2)  # bit-identical across runs
    adj = collections.defaultdict(list)
    for u, v in zip(src, dst):
        adj[int(u)].append(int(v))
    adj = {u: sorted(set(vs)) for u, vs in adj.items()}
    by_walk = {wid: g.sort_values("step")["vertex_id"].tolist()
               for wid, g in w1.groupby("walk_id")}
    assert set(by_walk) == set(adj)
    for wid, path in by_walk.items():
        assert path[0] == wid
        for t, (u, v) in enumerate(zip(path[:-1], path[1:]), start=1):
            nbrs = adj[u]
            idx = md5_u64_one(f"{wid}:{t}") % len(nbrs)
            assert v == nbrs[idx], (wid, t)


def test_weighted_random_walks_follow_cdf_rule():
    """Weighted hops land in the correct inclusive-cumsum bracket of the
    dst-sorted neighbor weights."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.graph.walks import random_walks
    from graphminingtools_ray.stages.dedup_md5 import md5_u64_one

    rng = np.random.default_rng(73)
    n = 25
    a = rng.integers(0, n, 90)
    b = rng.integers(0, n, 90)
    m = a != b
    pairs = sorted({tuple(sorted((int(x), int(y))))
                    for x, y in zip(a[m], b[m])})
    w = {p: int(rng.integers(1, 7)) for p in pairs}
    src = [p[0] for p in pairs] + [p[1] for p in pairs]
    dst = [p[1] for p in pairs] + [p[0] for p in pairs]
    wt = [w[p] for p in pairs] * 2
    sym = rd.from_arrow(pa.table({
        "src": np.array(src, np.int64), "dst": np.array(dst, np.int64),
        "weight": np.array(wt, np.int64),
    }))
    walks = (random_walks(sym, length=4, num_buckets=4, weighted=True)
             .to_pandas())
    adj = {}
    for u, v, ww in zip(src, dst, wt):
        adj.setdefault(u, {})[v] = ww
    by_walk = {wid: g.sort_values("step")["vertex_id"].tolist()
               for wid, g in walks.groupby("walk_id")}
    for wid, path in by_walk.items():
        for t, (u, v) in enumerate(zip(path[:-1], path[1:]), start=1):
            nbrs = sorted(adj[u])
            cum = np.cumsum([adj[u][x] for x in nbrs])
            r = md5_u64_one(f"{wid}:{t}") % int(cum[-1])
            want = nbrs[int(np.searchsorted(cum, r, side="right"))]
            assert v == want, (wid, t)


def test_node2vec_walks_follow_bias_rule():
    """Each biased hop matches the integer bias rule (1 return / 2 common
    neighbor / 4 exploring) through the seeded cumsum; first hop uniform."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.graph.walks import node2vec_walks
    from graphminingtools_ray.stages.dedup_md5 import md5_u64_one

    rng = np.random.default_rng(79)
    n = 25
    a = rng.integers(0, n, 100)
    b = rng.integers(0, n, 100)
    m = a != b
    pairs = sorted({tuple(sorted((int(x), int(y))))
                    for x, y in zip(a[m], b[m])})
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    sym = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    walks = node2vec_walks(sym, length=4, num_buckets=4).to_pandas()
    import collections

    adj = collections.defaultdict(set)
    for u, v in zip(src, dst):
        adj[int(u)].add(int(v))
    by_walk = {wid: g.sort_values("step")["vertex_id"].tolist()
               for wid, g in walks.groupby("walk_id")}
    for wid, path in by_walk.items():
        # first hop: uniform index
        nbrs = sorted(adj[path[0]])
        idx = md5_u64_one(f"{wid}:1") % len(nbrs)
        assert path[1] == nbrs[idx], (wid, "step1")
        for t in range(2, len(path)):
            prev, cur = path[t - 2], path[t - 1]
            cands = sorted(adj[cur])
            wgt = [1 if c == prev else (2 if c in adj[prev] else 4)
                   for c in cands]
            cum = np.cumsum(wgt)
            r = md5_u64_one(f"{wid}:{t}") % int(cum[-1])
            want = cands[int(np.searchsorted(cum, r, side="right"))]
            assert path[t] == want, (wid, t)


def test_lpa_range_split_invariance(ray_session, monkeypatch):
    """The range-split update is exact for ANY split factor (the winner rule
    is per-dst): labels bit-identical across n_sub = 1 / 3 / 8."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos.labelprop import label_propagation
    from graphminingtools_ray.graph.build import symmetrize

    rng = np.random.default_rng(7)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    m = src != dst
    edges = symmetrize(rd.from_arrow(pa.table(
        {"src": pa.array(src[m], pa.int64()),
         "dst": pa.array(dst[m], pa.int64())}
    ))).materialize()

    outs = []
    for nsub in ("1", "3", "8"):
        monkeypatch.setenv("GRAFT_LPA_NSUB", nsub)
        ids, labels, _ = label_propagation(
            edges, max_iter=8, num_state_partitions=4
        )
        order = np.argsort(ids)
        outs.append((ids[order], labels[order]))
    for ids, labels in outs[1:]:
        assert (ids == outs[0][0]).all()
        assert (labels == outs[0][1]).all()


def test_skipgram_pairs_micro(ray_session):
    """Skip-gram pairs from a tiny hand-built corpus: positives = both
    directions of every within-window step pair; negatives follow the md5
    draw over the sorted distinct walk-id universe."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.graph.walks import skipgram_pairs
    from graphminingtools_ray.stages.dedup_md5 import md5_u64_one

    # two walks of length 2 (3 positions each)
    rows = []
    seq = {10: [10, 20, 30], 20: [20, 10, 20]}
    for wid, vs in seq.items():
        for s, v in enumerate(vs):
            rows.append((wid, s, v))
    corpus = rd.from_arrow(pa.table({
        "walk_id": [r[0] for r in rows],
        "step": [r[1] for r in rows],
        "vertex_id": [r[2] for r in rows],
    }))
    out = skipgram_pairs(corpus, window=1, neg=1).to_pandas()
    pos = out[out["label"] == 1]
    # window=1: per walk, pairs (0,1),(1,0),(1,2),(2,1) -> 4 each
    assert len(pos) == 8
    got = set(map(tuple, pos[["walk_id", "center_step",
                              "context_step"]].to_numpy()))
    for wid in (10, 20):
        for a, b in ((0, 1), (1, 0), (1, 2), (2, 1)):
            assert (wid, a, b) in got
    # per (walk, position) exactly one negative with the md5-ranked vertex
    neg = out[out["label"] == 0]
    assert len(neg) == 6
    uni = np.array([10, 20])  # sorted distinct walk ids
    for r in neg.itertuples():
        assert r.context_step == -1
        idx = md5_u64_one(f"{r.walk_id}:{r.center_step}:n1") % len(uni)
        assert r.context == uni[idx]
