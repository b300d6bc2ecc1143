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


def sample_spanning_trees_per_graph(
    n: int,
    edges: list[tuple[int, int]],
    graph_id: int,
    k: int = 1,
    method: str = "wilson",
    seed: int = 42,
):
    """k spanning-tree samples of one (connected) graph; deterministic in
    (seed, graph_id, method, k)."""
    rng = np.random.default_rng(np.random.PCG64(seed ^ (graph_id + 1)))
    adj: list[list[int]] = [[] for _ in range(n)]
    for v, w in edges:
        if v != w:
            adj[v].append(w)
            adj[w].append(v)
    out = []
    for _ in range(k):
        if method == "wilson":
            out.append(wilson_spanning_tree(n, adj, rng))
        elif method == "kruskal":
            out.append(kruskal_random_spanning_tree(n, edges, rng))
        else:
            raise ValueError(f"unknown method {method!r}")
    return out
