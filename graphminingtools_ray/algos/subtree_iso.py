"""Subtree-isomorphism embedding operators — the reference's core mining
primitive (``/root/reference/iterativeSubtreeIsomorphism.c:293-306`` rooted
DP over the host tree, ``:507-560`` the characteristics cube;
``bipartiteMatching.c`` the child-assignment matching). Round-2 addition:
this unlocks general-TREE levelwise mining (the reference's flagship ``lwg``)
beyond the round-1 path-only subclass.

Two exact embedding tests, both label-preserving (vertex AND edge labels)
and injective (subgraph, not induced):

- ``subtree_iso_trees``: unrooted pattern tree ⊑ host TREE via the
  reference's algorithm shape — root the host anywhere; for each rooting of
  the pattern, a bottom-up DP marks (pattern-subtree, host-vertex) pairs
  embeddable, deciding each pair with a bipartite matching between pattern
  children and host children (Kuhn augmenting paths — the reference calls
  its own ``bipartiteMatchingEvenMoreDirty``). Polynomial, exact.
  (The reference additionally CARRIES the DP cube across mining levels,
  ``newCube.h:22-29``; we recompute per level — patterns here are ≤ a few
  edges and transactions are small, so the recompute is cheaper than
  shipping the cube through the exchange.)

- ``tree_in_graph``: unrooted pattern tree ⊑ arbitrary host GRAPH via
  label-pruned backtracking (DFS-ordered pattern, injective assignment).
  Tree-in-graph subgraph iso is NP-hard in general (Hamiltonian path), so
  this is reserved for the engine's SMALL per-transaction graphs — exactly
  the reference's regime (per-molecule graphs of tens of vertices).

Both operate on the plain (vertices: {id: label}, edges: [(a, b, elabel)])
structures used by functions.cstring.
"""

from __future__ import annotations


def _adj(vertices: dict, edges: list) -> dict:
    adj: dict = {v: [] for v in vertices}
    for a, b, el in edges:
        adj[a].append((b, el))
        adj[b].append((a, el))
    return adj


def _bipartite_match(n_left: int, cand: list[list[int]]) -> bool:
    """True iff every left vertex can be matched (Kuhn augmenting paths).
    ``cand[i]`` = list of right vertices admissible for left i."""
    match_r: dict[int, int] = {}

    def augment(i: int, seen: set) -> bool:
        for j in cand[i]:
            if j in seen:
                continue
            seen.add(j)
            if j not in match_r or augment(match_r[j], seen):
                match_r[j] = i
                return True
        return False

    for i in range(n_left):
        if not augment(i, set()):
            return False
    return True


def subtree_iso_trees(
    p_vertices: dict, p_edges: list, h_vertices: dict, h_edges: list
) -> bool:
    """Unrooted labeled pattern TREE ⊑ host TREE (subgraph embedding)."""
    if len(p_vertices) > len(h_vertices):
        return False
    if not p_vertices:
        return True
    p_adj = _adj(p_vertices, p_edges)
    h_adj = _adj(h_vertices, h_edges)
    h_ids = list(h_vertices)
    h_root = h_ids[0]

    # host rooted structure: parent map + post-order
    parent = {h_root: None}
    order = []
    stack = [h_root]
    while stack:
        v = stack.pop()
        order.append(v)
        for w, _ in h_adj[v]:
            if w not in parent:
                parent[w] = v
                stack.append(w)
    post = list(reversed(order))

    def rooted_children(root: int, adj: dict) -> dict:
        par = {root: None}
        out = {v: [] for v in adj}
        st = [root]
        while st:
            v = st.pop()
            for w, el in adj[v]:
                if w not in par:
                    par[w] = v
                    out[v].append((w, el))
                    st.append(w)
        return out

    # for each pattern rooting: bottom-up DP over the host
    for p_root in p_vertices:
        p_children = rooted_children(p_root, p_adj)
        # pattern post-order
        p_post = []
        st = [(p_root, False)]
        while st:
            u, done = st.pop()
            if done:
                p_post.append(u)
                continue
            st.append((u, True))
            for w, _ in p_children[u]:
                st.append((w, False))
        can = {}  # (pattern_vertex, host_vertex) -> bool
        for pu in p_post:
            kids = p_children[pu]
            for v in post:
                if p_vertices[pu] != h_vertices[v]:
                    can[(pu, v)] = False
                    continue
                if not kids:
                    can[(pu, v)] = True
                    continue
                # host children of v (w.r.t. the host rooting)
                h_kids = [(w, el) for w, el in h_adj[v] if parent.get(w) == v]
                if len(h_kids) < len(kids):
                    can[(pu, v)] = False
                    continue
                cand = [
                    [
                        j
                        for j, (w, hel) in enumerate(h_kids)
                        if hel == pel and can[(pw, w)]
                    ]
                    for pw, pel in kids
                ]
                can[(pu, v)] = _bipartite_match(len(kids), cand)
        if any(can[(p_root, v)] for v in post):
            return True
    return False


def count_tree_embeddings(
    p_vertices: dict, p_edges: list, g_vertices: dict, g_edges: list
) -> int:
    """EXACT number of embeddings (injective label- and edge-label-
    preserving maps) of the pattern tree into the host graph — the quantity
    the HOPS sampler estimates (``subtreeIsomorphismSampling.c`` scope).
    Backtracking count; small hosts only."""
    if not p_vertices:
        return 1
    p_adj = _adj(p_vertices, p_edges)
    g_adj = _adj(g_vertices, g_edges)
    p_ids = list(p_vertices)
    root = p_ids[0]
    dfs = [root]
    attach = {}
    seen = {root}
    stack = [root]
    while stack:
        u = stack.pop()
        for w, el in p_adj[u]:
            if w not in seen:
                seen.add(w)
                attach[w] = (u, el)
                dfs.append(w)
                stack.append(w)
    assign: dict = {}
    used: set = set()
    total = 0

    def bt(i: int):
        nonlocal total
        if i == len(dfs):
            total += 1
            return
        u = dfs[i]
        ul = p_vertices[u]
        if i == 0:
            for v in g_vertices:
                if g_vertices[v] != ul or v in used:
                    continue
                assign[u] = v
                used.add(v)
                bt(i + 1)
                used.discard(v)
            return
        anchor, el = attach[u]
        for w, hel in g_adj[assign[anchor]]:
            if hel != el or w in used or g_vertices[w] != ul:
                continue
            assign[u] = w
            used.add(w)
            bt(i + 1)
            used.discard(w)

    bt(0)
    return total


def hops_embedding_estimate(
    p_vertices: dict,
    p_edges: list,
    g_vertices: dict,
    g_edges: list,
    n_samples: int = 256,
    seed: int = 17,
) -> float:
    """HOPS-style unbiased sampling estimate of the embedding count
    (``/root/reference/subtreeIsomorphismSampling.c`` semantics; the
    published HOPS estimator): sample a random embedding by walking the
    pattern in DFS order, at each step choosing uniformly among the
    admissible (label-matching, unused) host vertices; the sample weight is
    the product of the choice-set sizes, zero on a dead end. Each embedding
    is reached along exactly one sampling path with probability 1/weight,
    so E[weight] = exact embedding count — unbiased for ANY pattern order.
    Deterministic for a fixed seed."""
    import numpy as np

    if not p_vertices:
        return 1.0
    rng = np.random.default_rng(np.random.PCG64(seed))
    p_adj = _adj(p_vertices, p_edges)
    g_adj = _adj(g_vertices, g_edges)
    p_ids = list(p_vertices)
    root = p_ids[0]
    dfs = [root]
    attach = {}
    seen = {root}
    stack = [root]
    while stack:
        u = stack.pop()
        for w, el in p_adj[u]:
            if w not in seen:
                seen.add(w)
                attach[w] = (u, el)
                dfs.append(w)
                stack.append(w)
    root_cands = [v for v in g_vertices if g_vertices[v] == p_vertices[root]]
    total = 0.0
    for _ in range(n_samples):
        if not root_cands:
            break
        w_est = float(len(root_cands))
        assign = {root: root_cands[int(rng.integers(0, len(root_cands)))]}
        used = {assign[root]}
        ok = True
        for u in dfs[1:]:
            anchor, el = attach[u]
            cands = [
                w
                for w, hel in g_adj[assign[anchor]]
                if hel == el and w not in used and g_vertices[w] == p_vertices[u]
            ]
            if not cands:
                ok = False
                break
            w_est *= len(cands)
            pick = cands[int(rng.integers(0, len(cands)))]
            assign[u] = pick
            used.add(pick)
        if ok:
            total += w_est
    return total / n_samples


def _matching_count_dp(cand_sets: list[set]) -> tuple:
    """Count children-saturating matchings of the bipartite graph child i →
    candidate set cand_sets[i] (a permanent over the biadjacency matrix).
    -> (count_table f, cands) where cands is the sorted candidate universe
    and f[j][mask] = number of ways to match exactly the children in
    ``mask`` using only candidates cands[j:]. O(|cands| · 2^k · k)."""
    cands = sorted({c for s in cand_sets for c in s})
    kk = len(cand_sets)
    full = (1 << kk) - 1
    nc = len(cands)
    f = [[0] * (full + 1) for _ in range(nc + 1)]
    f[nc][0] = 1
    for j in range(nc - 1, -1, -1):
        cj = cands[j]
        row = f[j]
        nxt = f[j + 1]
        for mask in range(full + 1):
            tot = nxt[mask]  # candidate j left unmatched
            m = mask
            while m:
                i = (m & -m).bit_length() - 1
                if cj in cand_sets[i]:
                    tot += nxt[mask & ~(1 << i)]
                m &= m - 1
            row[mask] = tot
    return f, cands


def hops_embedding_estimate_matching(
    p_vertices: dict,
    p_edges: list,
    g_vertices: dict,
    g_edges: list,
    n_samples: int = 256,
    seed: int = 17,
) -> float:
    """The matching-based HOPS estimator (the reference's
    FKM/FKF operator family, ``subtreeIsoUtils`` matching path consumed by
    ``lwm_embeddingOperators.h:33``; the `lwg -e hops` default is this
    shape): like :func:`hops_embedding_estimate` but each pattern vertex
    embeds ALL its children JOINTLY — the sample weight multiplies by the
    number of children-saturating matchings of the children × admissible-
    neighbor bipartite graph (a permanent, computed exactly by subset DP),
    and one such matching is drawn uniformly. Every complete embedding is
    reached along exactly one sampling path with probability ∏ 1/M_u, so
    E[weight] = exact embedding count (unbiased), with strictly lower
    variance than the one-child-at-a-time estimator (dead ends are detected
    a level earlier: M_u = 0 kills the sample before committing children).
    Deterministic for a fixed seed."""
    import numpy as np

    if not p_vertices:
        return 1.0
    rng = np.random.default_rng(np.random.PCG64(seed))
    p_adj = _adj(p_vertices, p_edges)
    g_adj = _adj(g_vertices, g_edges)
    p_ids = list(p_vertices)
    root = p_ids[0]
    # BFS over the pattern, recording each vertex's children (+ edge labels)
    children: dict = {u: [] for u in p_vertices}
    order = [root]
    seen = {root}
    qi = 0
    while qi < len(order):
        u = order[qi]
        qi += 1
        for w, el in p_adj[u]:
            if w not in seen:
                seen.add(w)
                children[u].append((w, el))
                order.append(w)
    root_cands = [v for v in g_vertices if g_vertices[v] == p_vertices[root]]
    total = 0.0
    for _ in range(n_samples):
        if not root_cands:
            break
        w_est = float(len(root_cands))
        assign = {root: root_cands[int(rng.integers(0, len(root_cands)))]}
        used = {assign[root]}
        ok = True
        for u in order:
            kids = children[u]
            if not kids or not ok:
                if not ok:
                    break
                continue
            cand_sets = [
                {
                    w
                    for w, hel in g_adj[assign[u]]
                    if hel == el and w not in used
                    and g_vertices[w] == p_vertices[c]
                }
                for c, el in kids
            ]
            if any(not s for s in cand_sets):
                ok = False
                break
            f, cands = _matching_count_dp(cand_sets)
            full = (1 << len(kids)) - 1
            m_u = f[0][full]
            if m_u == 0:
                ok = False
                break
            w_est *= float(m_u)
            # draw one children-saturating matching uniformly by walking the
            # DP: at candidate j, split mass between "j unmatched" and
            # "j matched to child i" for each admissible unmatched child i
            mask = full
            for j, cj in enumerate(cands):
                if mask == 0:
                    break
                weights = [f[j + 1][mask]]
                picks = [None]
                m = mask
                while m:
                    i = (m & -m).bit_length() - 1
                    if cj in cand_sets[i]:
                        weights.append(f[j + 1][mask & ~(1 << i)])
                        picks.append(i)
                    m &= m - 1
                tot = sum(weights)
                r = int(rng.integers(0, tot))
                acc = 0
                for wgt, pick in zip(weights, picks):
                    acc += wgt
                    if r < acc:
                        if pick is not None:
                            assign[kids[pick][0]] = cj
                            used.add(cj)
                            mask &= ~(1 << pick)
                        break
        if ok:
            total += w_est
    return total / n_samples


def tree_in_graph(
    p_vertices: dict, p_edges: list, g_vertices: dict, g_edges: list
) -> bool:
    """Unrooted labeled pattern tree ⊑ arbitrary labeled host graph
    (subgraph embedding, injective). Label-pruned backtracking — exact;
    intended for the engine's small per-transaction graphs."""
    if len(p_vertices) > len(g_vertices):
        return False
    if not p_vertices:
        return True
    p_adj = _adj(p_vertices, p_edges)
    g_adj = _adj(g_vertices, g_edges)

    # DFS order of pattern vertices so each (after the first) attaches to an
    # already-assigned neighbor
    p_ids = list(p_vertices)
    root = p_ids[0]
    dfs = [root]
    attach = {}  # vertex -> (assigned neighbor, edge label)
    seen = {root}
    stack = [root]
    while stack:
        u = stack.pop()
        for w, el in p_adj[u]:
            if w not in seen:
                seen.add(w)
                attach[w] = (u, el)
                dfs.append(w)
                stack.append(w)

    assign: dict = {}
    used: set = set()

    def bt(i: int) -> bool:
        if i == len(dfs):
            return True
        u = dfs[i]
        ul = p_vertices[u]
        if i == 0:
            cands = (v for v in g_vertices if g_vertices[v] == ul)
            for v in cands:
                if v in used:
                    continue
                assign[u] = v
                used.add(v)
                if bt(i + 1):
                    return True
                used.discard(v)
                del assign[u]
            return False
        anchor, el = attach[u]
        av = assign[anchor]
        for w, hel in g_adj[av]:
            if hel != el or w in used or g_vertices[w] != ul:
                continue
            assign[u] = w
            used.add(w)
            if bt(i + 1):
                return True
            used.discard(w)
            del assign[u]
        return False

    return bt(0)


def rooted_tree_in_digraph(
    p_vertices: dict, p_edges: list, g_vertices: dict, g_edges: list
) -> bool:
    """ROOTED labeled pattern tree ⊑ DIRECTED labeled host graph: does some
    host vertex v admit an injective embedding with root -> v and every
    pattern edge (parent -> child, label) mapped to a host out-edge of the
    parent's image with the same label? This is the rooted embedding
    operator of the reference's lwgr family
    (``/root/reference/lwmr_embeddingOperators.c:31-43``
    rootedSubtreeComputationOperator ->
    ``iterativeSubtreeIsomorphism.c:569-614,651`` — there a Shamir-Tsur DP
    over forest transactions; here label-pruned backtracking, exact for
    ARBITRARY digraph transactions, intended for small per-transaction
    graphs). ``p_edges`` directed (parent, child, label); the pattern root
    is the unique in-degree-0 vertex.
    """
    if len(p_vertices) > len(g_vertices):
        return False
    if not p_vertices:
        return True
    children: dict = {v: [] for v in p_vertices}
    indeg = {v: 0 for v in p_vertices}
    for p, c, el in p_edges:
        children[p].append((c, el))
        indeg[c] += 1
    root = next(v for v in p_vertices if indeg[v] == 0)
    g_out: dict = {v: [] for v in g_vertices}
    for a, b, el in g_edges:
        g_out[a].append((b, el))

    # DFS order: each pattern vertex after the root attaches to its parent
    dfs = [root]
    attach: dict = {}
    stack = [root]
    while stack:
        u = stack.pop()
        for c, el in children[u]:
            attach[c] = (u, el)
            dfs.append(c)
            stack.append(c)

    assign: dict = {}
    used: set = set()

    def bt(i: int) -> bool:
        if i == len(dfs):
            return True
        u = dfs[i]
        ul = p_vertices[u]
        if i == 0:
            for v in g_vertices:
                if g_vertices[v] != ul or v in used:
                    continue
                assign[u] = v
                used.add(v)
                if bt(i + 1):
                    return True
                used.discard(v)
                del assign[u]
            return False
        parent, el = attach[u]
        pv = assign[parent]
        for w, hel in g_out[pv]:
            if hel != el or w in used or g_vertices[w] != ul:
                continue
            assign[u] = w
            used.add(w)
            if bt(i + 1):
                return True
            used.discard(w)
            del assign[u]
        return False

    return bt(0)
