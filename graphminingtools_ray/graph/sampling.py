"""Spanning-tree sampling kernels — engine analog of the reference's ``ts``
tree-sampling suite (``/root/reference/sampleSubtrees.c:69-368``, Wilson's
loop-erased random walk ``wilsonsAlgorithm.c:113-194``, shuffled-edge
Kruskal ``kruskalsAlgorithm.c:45``).

Per-graph kernels with PER-GRAPH seeded RNG (``PCG64(seed ^ graph_id)``) so
results are independent of batching and num_cpus — the reference's
process-global ``srand`` is deliberately not copied (SURVEY §4 determinism).
"""

from __future__ import annotations

import numpy as np

TS_METHODS = (
    "wilson",
    "kruskal",
    "listing",
    "mix",
    "partial_listing",
    "cactus",
    "bridge_forest",
    "list_or_sample",
)


def tree_sampling_measures(
    gdb_vertices,
    gdb_edges,
    k: int = 5,
    seed: int = 42,
    threshold: int = 100,
    methods: tuple[str, ...] = TS_METHODS,
):
    """Distributed ``ts`` suite: one row per graph with, per strategy, the
    number of isomorphism classes among k sampled spanning trees (the
    reference's ``treeSamplingMain.c`` canonicalString output mode counted
    through a search tree). Long-table union → hash-bucketed exchange on
    graph_id → per-graph kernels inside each bucket. Deterministic in
    (seed, graph_id, method)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd  # noqa: F401

    from ..functions.bucketing import bucketed_group_combine

    v_rows = gdb_vertices.map_batches(
        lambda t: pa.table(
            {
                "graph_id": t["graph_id"].cast(pa.int64()),
                "a": t["vertex_id"].cast(pa.int64()),
                "b": pa.nulls(t.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    e_rows = gdb_edges.map_batches(
        lambda t: pa.table(
            {
                "graph_id": t["graph_id"].cast(pa.int64()),
                "a": t["v"].cast(pa.int64()),
                "b": t["w"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    cols = [f"noniso_{m}" for m in methods]

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_rows = []
        for gid, g in df.groupby("graph_id", sort=True):
            vids = sorted(g.loc[g["b"].isna(), "a"].astype(int).tolist())
            index = {v: i for i, v in enumerate(vids)}
            ee = g.dropna(subset=["b"])
            edges = [
                (index[int(a)], index[int(b)])
                for a, b in zip(ee["a"], ee["b"])
            ]
            row = {"graph_id": int(gid)}
            for m in methods:
                row[f"noniso_{m}"] = noniso_sampled_spanning_trees(
                    len(vids), edges, int(gid), k, method=m, seed=seed,
                    threshold=threshold,
                )
            out_rows.append(row)
        if not out_rows:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ["graph_id"] + cols}
            )
        return pa.Table.from_pandas(
            pd.DataFrame(out_rows)[["graph_id"] + cols], preserve_index=False
        )

    return bucketed_group_combine(v_rows.union(e_rows), ["graph_id"], per_bucket)


def wilson_spanning_tree(
    n: int, adj: list[list[int]], rng: np.random.Generator
) -> list[tuple[int, int]]:
    """Uniform random spanning tree via Wilson's loop-erased random walks.
    ``adj`` is 0-based adjacency of a CONNECTED graph; returns n-1 edges."""
    if n == 0:
        return []
    in_tree = np.zeros(n, dtype=bool)
    root = int(rng.integers(0, n))
    in_tree[root] = True
    nxt = np.full(n, -1, dtype=np.int64)
    for start in range(n):
        if in_tree[start]:
            continue
        # random walk until the tree is hit, recording successor pointers
        # (loop erasure happens implicitly: later visits overwrite nxt)
        u = start
        while not in_tree[u]:
            nxt[u] = adj[u][int(rng.integers(0, len(adj[u])))]
            u = int(nxt[u])
        # commit the loop-erased path
        u = start
        while not in_tree[u]:
            in_tree[u] = True
            u = int(nxt[u])
    return [(v, int(nxt[v])) for v in range(n) if v != root and nxt[v] >= 0
            and in_tree[v]]


def sampled_spanning_forest(
    g_vertices: dict, g_edges: list, k: int, seed: int
) -> tuple[dict, list]:
    """The `ps` transaction transform (reference
    ``getNonisomorphicSpanningTreeSamplesOfDB`` feeding
    ``initProbabilisticTreeMiningForGraphDB``, ``lwm_initAndCollect.c:728``;
    *Probabilistic Frequent Subtrees*, Welke et al. MLJ 2018): replace a
    labeled host graph by the FOREST of k spanning trees sampled per
    connected component (Wilson-uniform, deduplicated by edge set — the
    non-isomorphic-sample dedup), each sampled tree a disjoint copy with
    fresh vertex ids and the original labels. A tree pattern embeds in the
    forest iff it embeds in one of the sampled trees, so the exact subtree
    operator over this transaction is the reference's `lwg -e ps` support
    predicate (one-sided: matches are certificates).

    Parallel edges between the same endpoint pair collapse to the
    lexicographically smallest edge label (the sampler walks the simple
    graph); deterministic for a fixed (host, k, seed).
    """
    rng = np.random.default_rng(np.random.PCG64(seed))
    vs = sorted(g_vertices)
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    lab: dict[tuple[int, int], str] = {}
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b, el in g_edges:
        if a == b:
            continue
        key = (min(idx[a], idx[b]), max(idx[a], idx[b]))
        if key not in lab:
            adj[key[0]].append(key[1])
            adj[key[1]].append(key[0])
            lab[key] = el
        elif el < lab[key]:
            lab[key] = el
    comp = np.full(n, -1, dtype=np.int64)
    nc = 0
    for root in range(n):
        if comp[root] != -1:
            continue
        stack = [root]
        comp[root] = nc
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if comp[w] == -1:
                    comp[w] = nc
                    stack.append(w)
        nc += 1
    fv: dict = {}
    fe: list = []
    nxt = 0
    for c in range(nc):
        verts = [v for v in range(n) if comp[v] == c]
        if len(verts) == 1:
            fv[nxt] = g_vertices[vs[verts[0]]]
            nxt += 1
            continue
        remap = {v: i for i, v in enumerate(verts)}
        sub_adj: list[list[int]] = [[] for _ in verts]
        for v in verts:
            for w in adj[v]:
                sub_adj[remap[v]].append(remap[w])
        seen: set = set()
        for _ in range(k):
            st = wilson_spanning_tree(len(verts), sub_adj, rng)
            key = frozenset((min(a, b), max(a, b)) for a, b in st)
            if key in seen:
                continue
            seen.add(key)
            base = nxt
            for i, v in enumerate(verts):
                fv[base + i] = g_vertices[vs[v]]
            nxt += len(verts)
            for a, b in st:
                va, vb = verts[min(a, b)], verts[max(a, b)]
                fe.append((base + min(a, b), base + max(a, b),
                           lab[(va, vb)]))
    return fv, fe


def kruskal_random_spanning_tree(
    n: int, edges: list[tuple[int, int]], rng: np.random.Generator
) -> list[tuple[int, int]]:
    """Spanning tree from a random edge order (union-find) — the reference's
    ``sampleSpanningTreeEdgesUsingKruskal`` shape (NOT uniform over trees)."""
    order = rng.permutation(len(edges))
    parent = list(range(n))

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    out = []
    for i in order:
        v, w = edges[int(i)]
        rv, rw = find(v), find(w)
        if rv != rw:
            parent[rv] = rw
            out.append((v, w))
            if len(out) == n - 1:
                break
    return out


def enumerate_spanning_trees(
    n: int, edges: list[tuple[int, int]], comb_cap: int = 200_000
) -> list[list[tuple[int, int]]] | None:
    """Exact spanning-tree listing of a small CONNECTED graph (reference
    ``listSpanningTrees.c:409-437``): every (n-1)-subset of the simple edge
    set that forms a tree (union-find acyclicity check). Returns ``None``
    when ``C(m, n-1)`` exceeds ``comb_cap`` (caller falls back to sampling,
    mirroring the reference's threshold dispatch)."""
    from itertools import combinations
    from math import comb

    simple = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    m = len(simple)
    if n <= 1:
        return [[]]
    if m < n - 1 or comb(m, n - 1) > comb_cap:
        return None
    out = []
    for sub in combinations(simple, n - 1):
        parent = list(range(n))

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        ok = True
        for a, b in sub:
            ra, rb = find(a), find(b)
            if ra == rb:
                ok = False
                break
            parent[ra] = rb
        if ok:
            out.append(list(sub))
    return out


def _blocks_of(n: int, edges: list[tuple[int, int]]):
    """(bridge_edges, cycle_block_edge_lists, n_blocks) via the shared Tarjan
    kernel (graph.gdb)."""
    from .gdb import _bridges_and_blocks

    adj: list[list[int]] = [[] for _ in range(n)]
    for v, w in edges:
        if v != w:
            adj[v].append(w)
            adj[w].append(v)
    n_bridges, n_blocks, bridge_edges, _, _, bcc = _bridges_and_blocks(n, adj)
    blocks = [b for b in bcc if len(b) > 1]
    return bridge_edges, blocks, n_blocks


def spanning_tree_upper_bound(n: int, edges: list[tuple[int, int]]) -> int:
    """Block-decomposition upper bound on the spanning-tree count — the
    ``getGoodEstimate`` role (``upperBoundsForSpanningTrees.c``): product
    over biconnected components of C(m_b, n_b - 1). Assumes connected."""
    from math import comb

    from .gdb import SPANNING_TREE_CAP

    bridge_edges, blocks, _ = _blocks_of(n, edges)
    est = 1
    for bes in blocks:
        nb = len({x for e in bes for x in e})
        est *= comb(len(bes), nb - 1)
        if est >= int(SPANNING_TREE_CAP):
            return int(SPANNING_TREE_CAP)
    return int(est)


def cactus_spanning_tree(
    bridge_edges: list[tuple[int, int]],
    cycle_blocks: list[list[tuple[int, int]]],
    rng: np.random.Generator,
) -> list[tuple[int, int]]:
    """One uniform spanning tree of a CACTUS graph: keep every bridge, drop
    one uniformly-random edge from each cycle block (the reference's
    ``sampleSpanningTreeEdgesFromCactus``, ``sampleSubtrees.c:268-287``
    dispatch). Exact-uniform because cactus blocks are edge-disjoint cycles."""
    out = list(bridge_edges)
    for bes in cycle_blocks:
        drop = int(rng.integers(0, len(bes)))
        out.extend(e for i, e in enumerate(bes) if i != drop)
    return out


def sample_spanning_trees_per_graph(
    n: int,
    edges: list[tuple[int, int]],
    graph_id: int,
    k: int = 1,
    method: str = "wilson",
    seed: int = 42,
    threshold: int = 100,
):
    """k spanning-tree samples of one (connected) graph; deterministic in
    (seed, graph_id, method, k, threshold).

    Methods mirror the reference's ``ts`` strategy dispatch
    (``treeSamplingMain.c:111-143`` → ``sampleSubtrees.c:69-368``):

    - ``wilson``     — k uniform trees via loop-erased walks
    - ``kruskal``    — k trees from shuffled-edge Kruskal (not uniform)
    - ``listing``    — enumerate ALL trees, draw k uniformly (with
                       replacement, like the reference's ``rand() % nTrees``)
    - ``mix``        — listing when the block-bound estimate < threshold,
                       else wilson (``sampleSpanningTreesUsingMix``)
    - ``partial_listing`` — ONE tree: when estimate < threshold, the
                       ``rng % threshold``-th listed tree (clamped to the
                       listing — the reference's oversample case returns its
                       last listed tree); else one wilson sample
    - ``cactus``     — exact per-block sampling on cactus graphs, mix
                       fallback otherwise (``sampleSpanningTreesUsingCactusMix``)
    - ``bridge_forest`` — the bridge forest (each tree of bridges), k ignored
    - ``list_or_sample`` — ALL listed trees when estimate < threshold, else
                       k wilson samples (``listOrSampleSpanningTrees``)
    """
    rng = np.random.default_rng(np.random.PCG64(seed ^ (graph_id + 1)))
    adj: list[list[int]] = [[] for _ in range(n)]
    for v, w in edges:
        if v != w:
            adj[v].append(w)
            adj[w].append(v)

    def listing_draw(kk: int) -> list[list[tuple[int, int]]]:
        trees = enumerate_spanning_trees(n, edges)
        if trees is None or not trees:
            return [wilson_spanning_tree(n, adj, rng) for _ in range(kk)]
        return [trees[int(rng.integers(0, len(trees)))] for _ in range(kk)]

    if method == "wilson":
        return [wilson_spanning_tree(n, adj, rng) for _ in range(k)]
    if method == "kruskal":
        return [kruskal_random_spanning_tree(n, edges, rng) for _ in range(k)]
    if method == "listing":
        return listing_draw(k)
    if method == "mix":
        if spanning_tree_upper_bound(n, edges) < threshold:
            return listing_draw(k)
        return [wilson_spanning_tree(n, adj, rng) for _ in range(k)]
    if method == "partial_listing":
        if spanning_tree_upper_bound(n, edges) < threshold:
            trees = enumerate_spanning_trees(n, edges)
            if trees:
                i = int(rng.integers(0, threshold))
                return [trees[min(i, len(trees) - 1)]]
        return [wilson_spanning_tree(n, adj, rng)]
    if method == "cactus":
        bridge_edges, blocks, n_blocks = _blocks_of(n, edges)
        m_simple = len({(min(a, b), max(a, b)) for a, b in edges if a != b})
        if n - 1 + n_blocks == m_simple:  # cactus test, outerplanar.c:39-69
            return [
                cactus_spanning_tree(bridge_edges, blocks, rng) for _ in range(k)
            ]
        if spanning_tree_upper_bound(n, edges) < threshold:
            return listing_draw(k)
        return [wilson_spanning_tree(n, adj, rng) for _ in range(k)]
    if method == "bridge_forest":
        bridge_edges, _, _ = _blocks_of(n, edges)
        # split the bridge forest into its trees (union-find grouping)
        parent = list(range(n))

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for a, b in bridge_edges:
            parent[find(a)] = find(b)
        groups: dict[int, list[tuple[int, int]]] = {}
        for a, b in bridge_edges:
            groups.setdefault(find(a), []).append((a, b))
        return [sorted(t) for _, t in sorted(groups.items())]
    if method == "list_or_sample":
        if spanning_tree_upper_bound(n, edges) < threshold:
            trees = enumerate_spanning_trees(n, edges)
            if trees is not None:
                return trees
        return [wilson_spanning_tree(n, adj, rng) for _ in range(k)]
    raise ValueError(f"unknown method {method!r}")


def noniso_sampled_spanning_trees(
    n: int,
    edges: list[tuple[int, int]],
    graph_id: int,
    k: int,
    method: str = "wilson",
    seed: int = 42,
    threshold: int = 100,
) -> int:
    """Number of isomorphism classes among k sampled spanning trees per
    connected component (reference
    ``getNumberOfNonisomorphicSpanningForestComponentsForKSamples``,
    ``sampleSubtrees.c:405-429``): sample, canonicalize (unlabeled tree
    cstring), count distinct. Disconnected graphs: per-component samples,
    classes pooled across components like the reference's search-tree."""
    from ..functions.cstring import canonical_tree_string

    # connected components (iterative DFS)
    comp = np.full(n, -1, dtype=np.int64)
    adj: list[list[int]] = [[] for _ in range(n)]
    for v, w in edges:
        if v != w:
            adj[v].append(w)
            adj[w].append(v)
    nc = 0
    for root in range(n):
        if comp[root] != -1:
            continue
        stack = [root]
        comp[root] = nc
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if comp[w] == -1:
                    comp[w] = nc
                    stack.append(w)
        nc += 1
    seen: set[str] = set()
    for c in range(nc):
        verts = np.flatnonzero(comp == c)
        if len(verts) <= 1:
            continue
        remap = {int(v): i for i, v in enumerate(verts)}
        sub = [
            (remap[a], remap[b])
            for a, b in edges
            if a != b and comp[a] == c
        ]
        trees = sample_spanning_trees_per_graph(
            len(verts), sub, graph_id * 131 + c, k=k, method=method,
            seed=seed, threshold=threshold,
        )
        for t in trees:
            if not t:
                continue
            vl = {v: "x" for e in t for v in e}
            cs = canonical_tree_string(vl, [(a, b, "e") for a, b in t])
            if cs is not None:
                seen.add(cs)
    return len(seen)
