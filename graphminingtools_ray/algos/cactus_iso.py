"""Tree-pattern subtree isomorphism into CACTUS transaction graphs — the
engine analog of the reference's cactus DP
(``/root/reference/cactustree.c:11-82`` cactusTreeSubIso, driver
``executables/cactus.c``): decide whether a labeled TREE pattern is subgraph
isomorphic to a labeled CACTUS host (every biconnected block a simple cycle
or a bridge).

Semantics note: for a tree pattern, subgraph iso into a cactus equals plain
subgraph iso (a tree image can never use all edges of a cycle), so
``algos.subtree_iso.tree_in_graph`` is already a correct oracle — the value
of this operator is the cactus-structured DP (the reference's reason to
exist): process the block tree bottom-up, enumerate the |C| spanning trees
of each cycle block LOCALLY (``cactustree.c:343-406``
initSpanningTree/nextSpanningTree), and compute per-vertex characteristics
(``cactustree.c:165-303``): (u, pu) at host vertex v = "the pattern subtree
rooted at u with parent pu embeds below v with u ↦ v". Work is local to a
block (sum over blocks of |C_b| · block DP) instead of the product of all
cycle choices.

Unlike the reference's treeID bookkeeping, cross-block consistency is kept
by construction: a child block exposes OFFERS to its cut vertex — one offer
per spanning tree of that block, carrying the ≤2 cut-adjacent slots with
their characteristic sets — and the parent's child-assignment search picks
at most ONE offer per child block (two pattern children routed through the
same block must agree on its spanning tree; this is exactly the constraint
the reference checks via checkCharacteristic(..., treeID)).
"""

from __future__ import annotations


def _biconnected_blocks(vertices: dict, edges: list) -> list[list[tuple]]:
    """Edge lists of the biconnected components (bridges included) of an
    undirected labeled graph — iterative Tarjan lowpoint, same decomposition
    the measure kernels use (reference listComponents.c)."""
    adj: dict = {v: [] for v in vertices}
    for i, (a, b, el) in enumerate(edges):
        adj[a].append((b, i))
        adj[b].append((a, i))
    disc: dict = {}
    low: dict = {}
    timer = 0
    out: list[list[tuple]] = []
    estack: list[int] = []
    for s in vertices:
        if s in disc:
            continue
        stack = [(s, None, iter(adj[s]))]
        disc[s] = low[s] = timer
        timer += 1
        while stack:
            v, pe, it = stack[-1]
            advanced = False
            for w, ei in it:
                if ei == pe:
                    continue
                if w not in disc:
                    estack.append(ei)
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, ei, iter(adj[w])))
                    advanced = True
                    break
                if disc[w] < disc[v]:
                    estack.append(ei)
                    if disc[w] < low[v]:
                        low[v] = disc[w]
            if advanced:
                continue
            stack.pop()
            if stack:
                u = stack[-1][0]
                if low[v] < low[u]:
                    low[u] = low[v]
                if low[v] >= disc[u]:
                    comp = []
                    while True:
                        ei = estack.pop()
                        comp.append(edges[ei])
                        if ei == pe:
                            break
                    out.append(comp)
    return out


def is_cactus_graph(vertices: dict, edges: list) -> bool:
    """Every biconnected block is a bridge or a simple cycle, no self loops
    or multi-edges (reference outerplanar.c:39-69 isCactus shape)."""
    seen = set()
    for a, b, _ in edges:
        if a == b:
            return False
        k = (min(a, b), max(a, b))
        if k in seen:
            return False
        seen.add(k)
    for bes in _biconnected_blocks(vertices, edges):
        if len(bes) == 1:
            continue
        vs = {x for e in bes for x in e[:2]}
        if len(bes) != len(vs):
            return False  # a block with m != n is not a simple cycle
    return True



def tree_in_cactus(
    p_vertices: dict, p_edges: list, g_vertices: dict, g_edges: list
) -> bool:
    """Exact: labeled tree pattern ⊑ labeled cactus host, via the
    block-tree / per-block-spanning-tree DP (reference ``cactustree.c``
    cactusTreeSubIso). Raises ValueError when the host is not a cactus
    (dispatch to ``subtree_iso.tree_in_graph`` for general hosts).

    Implementation: delegates to the GENERAL localEasy DP
    (``algos.local_easy.local_easy_match``) with exhaustive per-block
    spanning-tree enumeration — for a cactus every block is a bridge (one
    spanning tree) or a simple cycle of length c (exactly its c
    edge-removals, and the listing cost C(c, c-1) = c is linear), so the
    exhaustive regime always engages and the answer is exact. The 800-trial
    fuzz oracle in tests/test_cactus_iso.py pins this equivalence."""
    if not is_cactus_graph(g_vertices, g_edges):
        raise ValueError("host is not a cactus")
    from .local_easy import local_easy_match

    # cycle blocks list in O(c): cap = largest block edge count + 1
    cap = 2
    for bes in _biconnected_blocks(g_vertices, g_edges):
        cap = max(cap, len(bes) + 1)
    matched, exhaustive = local_easy_match(
        p_vertices, p_edges, g_vertices, g_edges, exact_cap=cap
    )
    assert exhaustive  # cactus blocks always list fully at this cap
    return matched
