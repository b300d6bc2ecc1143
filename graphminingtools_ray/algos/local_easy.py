"""The localEasy embedding-operator family — the engine analog of the
reference's ``localEasySubtreeIsomorphism.c`` (SpanningtreeTree +
subtreeCheckForSpanningtreeTree, :896-979; sampling/listing dispatch
:1081-1369): decide whether a labeled TREE pattern embeds into a labeled
host graph using, within each biconnected block, only the edges of ONE
spanning tree from a per-block spanning-tree SET.

Two regimes, like the reference's listing-or-sampling threshold dispatch:

- **exhaustive** (every block's spanning trees fully enumerated — feasible
  when blocks are small): the answer is EXACT subgraph isomorphism for
  arbitrary hosts. Proof shape: a tree image intersected with any block is a
  forest, hence contained in some spanning tree of that block, chosen per
  block independently; conversely any DP match assembles a genuine subgraph.
- **sampled** (k spanning trees per block, Wilson-uniform, deduplicated —
  ``localEasySubtreeIsomorphism.c:447-520`` filterDuplicateSpanningTrees):
  ONE-SIDED error — a match is certainly a real embedding; a miss may be a
  false negative. This is the probabilistic operator the reference's `lwg
  -e localEasy` and the ForLocalEasy poset strategies
  (``poset_pathCover.c:770-864``) consume.

The DP is the general form of the cactus DP (``algos.cactus_iso`` — there a
cycle block's spanning-tree set is exactly its |C| edge-removals): process
the block tree bottom-up; for each block, for each spanning tree, root it at
the block's cut vertex toward the component root and compute per-vertex
characteristics (u, pu) = "pattern subtree rooted at u with parent pu embeds
below this host vertex" in postorder; a block exposes OFFERS to its cut
vertex — one alternative per spanning tree carrying the cut-adjacent slots —
and the child-assignment search uses at most one alternative per block (two
pattern children routed through the same block must agree on its spanning
tree).
"""

from __future__ import annotations

import numpy as np

from .cactus_iso import _biconnected_blocks


def block_spanning_trees(
    bes: list[tuple], k: int, rng, exact_cap: int = 64
) -> tuple[list[list[tuple]], bool]:
    """Spanning trees of ONE biconnected block (labeled edges (a, b, el)).
    -> (list of labeled edge lists, exhaustive flag). Exhaustive listing when
    the block's C(m, n-1) candidate count is within ``exact_cap``; otherwise
    ``k`` Wilson-uniform samples, deduplicated by edge set."""
    from ..graph.sampling import enumerate_spanning_trees, wilson_spanning_tree

    if len(bes) == 1:
        return [list(bes)], True
    vs = sorted({x for e in bes for x in e[:2]})
    idx = {v: i for i, v in enumerate(vs)}
    lab = {}
    for a, b, el in bes:
        lab[(min(idx[a], idx[b]), max(idx[a], idx[b]))] = el
    pairs = sorted(lab)
    n = len(vs)
    listed = enumerate_spanning_trees(n, pairs, comb_cap=exact_cap)
    if listed is not None:
        out = [
            [(vs[a], vs[b], lab[(a, b)]) for a, b in st] for st in listed
        ]
        return out, True
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    seen: set = set()
    out = []
    for _ in range(k):
        st = wilson_spanning_tree(n, adj, rng)
        key = frozenset((min(a, b), max(a, b)) for a, b in st)
        if key in seen:
            continue
        seen.add(key)
        out.append(
            [(vs[min(a, b)], vs[max(a, b)], lab[(min(a, b), max(a, b))])
             for a, b in st]
        )
    return out, False


def _host_structures(
    g_vertices: dict, g_edges: list, k: int, seed: int, exact_cap: int
):
    """(blocks, trees_per_block, v_blocks, exhaustive) — the SpanningtreeTree
    of a host (reference getSampledSpanningtreeTree). Deterministic for a
    given (host, k, seed). Cacheable across patterns: the poset evaluators
    call the operator once per undecided pattern on the same host."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    blocks = _biconnected_blocks(g_vertices, g_edges)
    trees_per_block = []
    exhaustive = True
    for bes in blocks:
        sts, ex = block_spanning_trees(bes, k, rng, exact_cap)
        trees_per_block.append(sts)
        exhaustive = exhaustive and ex
    v_blocks: dict = {v: [] for v in g_vertices}
    for bi, bes in enumerate(blocks):
        for v in {x for e in bes for x in e[:2]}:
            v_blocks[v].append(bi)
    return blocks, trees_per_block, v_blocks, exhaustive


def local_easy_match(
    p_vertices: dict,
    p_edges: list,
    g_vertices: dict,
    g_edges: list,
    k: int = 8,
    seed: int = 0,
    exact_cap: int = 64,
    host_cache: dict | None = None,
) -> tuple[bool, bool]:
    """-> (matched, exhaustive). ``matched=True`` is always a certificate of
    a real embedding; when ``exhaustive`` (every block listed fully under
    ``exact_cap``) a ``False`` is also exact. ``host_cache`` (a dict the
    caller owns) memoizes the host's SpanningtreeTree by ``id(g_vertices)``
    so evaluating many patterns against one host decomposes it once; the
    fixed seed keeps the sampled trees identical across calls either way —
    required for the poset evaluators's monotone propagation to stay sound
    (an embedding of q restricted to a subpattern p uses the same per-block
    trees, so match(q) ⇒ match(p) per host)."""
    if not p_vertices:
        return True, True
    if len(p_vertices) > len(g_vertices):
        return False, True

    p_adj: dict = {u: [] for u in p_vertices}
    for a, b, el in p_edges:
        p_adj[a].append((b, el))
        p_adj[b].append((a, el))
    if len(p_edges) == 0:
        pl = p_vertices[next(iter(p_vertices))]
        return any(l == pl for l in g_vertices.values()), True

    key = (id(g_vertices), id(g_edges), k, seed, exact_cap)
    if host_cache is not None and key in host_cache:
        blocks, trees_per_block, v_blocks, exhaustive = host_cache[key]
    else:
        blocks, trees_per_block, v_blocks, exhaustive = _host_structures(
            g_vertices, g_edges, k, seed, exact_cap
        )
        if host_cache is not None:
            host_cache.clear()  # one host at a time: buckets iterate graphs
            host_cache[key] = (blocks, trees_per_block, v_blocks, exhaustive)

    found = [False]

    def match_children(u: int, pu, t_slots: list, offers: list) -> bool:
        """Injective routing of pattern vertex u's children (excluding pu)
        into t_slots ([(w, el, chars)] of the current spanning tree) and
        per-child-block offers ([alternatives], each a [(el, chars)] slot
        list sharing one spanning tree)."""
        kids = [(c, el) for c, el in p_adj[u] if c != pu]
        if not kids:
            return True
        if found[0]:
            return True
        used_t = [False] * len(t_slots)
        chosen: list = [None] * len(offers)

        def bt(i: int) -> bool:
            if i == len(kids):
                return True
            c, el = kids[i]
            for si, (w, sel, chars) in enumerate(t_slots):
                if used_t[si] or sel != el or (c, u) not in chars:
                    continue
                used_t[si] = True
                if bt(i + 1):
                    return True
                used_t[si] = False
            for oi, alts in enumerate(offers):
                if chosen[oi] is None:
                    for ai, alt in enumerate(alts):
                        for si, (sel, chars) in enumerate(alt):
                            if sel != el or (c, u) not in chars:
                                continue
                            flags = [False] * len(alt)
                            flags[si] = True
                            chosen[oi] = (ai, flags)
                            if bt(i + 1):
                                return True
                            chosen[oi] = None
                else:
                    ai, flags = chosen[oi]
                    for si, (sel, chars) in enumerate(alts[ai]):
                        if flags[si] or sel != el or (c, u) not in chars:
                            continue
                        flags[si] = True
                        if bt(i + 1):
                            return True
                        flags[si] = False
            return False

        return bt(0)

    def process_vertex(v: int, down_offers: list, t_slots: list) -> set:
        chars: set = set()
        vl = g_vertices[v]
        for u in p_vertices:
            if p_vertices[u] != vl:
                continue
            if match_children(u, None, t_slots, down_offers):
                found[0] = True
                return chars
            for pu, _ in p_adj[u]:
                if match_children(u, pu, t_slots, down_offers):
                    chars.add((u, pu))
        return chars

    def process_block(bi: int, cut: int, seen_blocks: set) -> list:
        bes = blocks[bi]
        members = {x for e in bes for x in e[:2]}
        sub_offers: dict = {v: [] for v in members}
        for v in members:
            if v == cut:
                continue
            for cbi in v_blocks[v]:
                if cbi != bi and cbi not in seen_blocks:
                    seen_blocks.add(cbi)
                    sub_offers[v].append(process_block(cbi, v, seen_blocks))
                    if found[0]:
                        return []
        alts = []
        for st in trees_per_block[bi]:
            adj: dict = {v: [] for v in members}
            for a, b, el in st:
                adj[a].append((b, el))
                adj[b].append((a, el))
            # postorder from cut over the spanning tree
            order = []
            parent = {cut: None}
            stack = [cut]
            while stack:
                x = stack.pop()
                order.append(x)
                for w, el in adj[x]:
                    if w not in parent:
                        parent[w] = x
                        stack.append(w)
            chars: dict = {}
            for v in reversed(order):
                if v == cut:
                    continue
                t_slots = [
                    (w, el, chars[w])
                    for w, el in adj[v]
                    if parent.get(w) == v
                ]
                chars[v] = process_vertex(v, sub_offers[v], t_slots)
                if found[0]:
                    return []
            alts.append(
                [(el, chars[w]) for w, el in adj[cut] if parent.get(w) == cut]
            )
        return alts

    g_adj: dict = {}
    for a, b, _ in g_edges:
        g_adj.setdefault(a, []).append(b)
        g_adj.setdefault(b, []).append(a)
    seen_blocks: set = set()
    visited_v: set = set()
    for r in sorted(g_vertices):
        if found[0]:
            break
        if r in visited_v:
            continue
        stack = [r]
        visited_v.add(r)
        while stack:
            x = stack.pop()
            for y in g_adj.get(x, ()):
                if y not in visited_v:
                    visited_v.add(y)
                    stack.append(y)
        root_offers = []
        for bi in v_blocks[r]:
            if bi not in seen_blocks:
                seen_blocks.add(bi)
                root_offers.append(process_block(bi, r, seen_blocks))
                if found[0]:
                    return True, exhaustive
        process_vertex(r, root_offers, [])
        if found[0]:
            return True, exhaustive
    return found[0], exhaustive
