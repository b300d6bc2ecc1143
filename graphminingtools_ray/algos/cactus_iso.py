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


def _cycle_order(bes: list[tuple]) -> list[tuple]:
    """Vertices of a cycle block in cyclic order with the edge labels:
    [(v0, v1, el01), (v1, v2, el12), ...] closing back to v0."""
    nxt: dict = {}
    for a, b, el in bes:
        nxt.setdefault(a, []).append((b, el))
        nxt.setdefault(b, []).append((a, el))
    start = min(nxt)
    order = [start]
    prev = None
    while True:
        cands = [w for w, _ in nxt[order[-1]] if w != prev]
        w = cands[0]
        if w == start:
            break
        prev = order[-1]
        order.append(w)
    out = []
    for i, v in enumerate(order):
        w = order[(i + 1) % len(order)]
        el = next(l for x, l in nxt[v] if x == w)
        out.append((v, w, el))
    return out


def tree_in_cactus(
    p_vertices: dict, p_edges: list, g_vertices: dict, g_edges: list
) -> bool:
    """Exact: labeled tree pattern ⊑ labeled cactus host. Raises ValueError
    when the host is not a cactus (dispatch to
    ``subtree_iso.tree_in_graph`` for general hosts)."""
    if not is_cactus_graph(g_vertices, g_edges):
        raise ValueError("host is not a cactus")
    if not p_vertices:
        return True
    if len(p_vertices) > len(g_vertices):
        return False

    # pattern structure
    p_adj: dict = {u: [] for u in p_vertices}
    for a, b, el in p_edges:
        p_adj[a].append((b, el))
        p_adj[b].append((a, el))
    if len(p_edges) == 0:
        pl = p_vertices[next(iter(p_vertices))]
        return any(l == pl for l in g_vertices.values())

    blocks = _biconnected_blocks(g_vertices, g_edges)
    # block tree: attach each block to its parent cut vertex. Root the walk
    # at the minimum host vertex (deterministic).
    v_blocks: dict = {v: [] for v in g_vertices}
    for bi, bes in enumerate(blocks):
        for v in {x for e in bes for x in e[:2]}:
            v_blocks[v].append(bi)

    found = [False]

    def match_children(u: int, pu, v: int, t_slots: list, offers: list) -> bool:
        """Can every child of pattern vertex u (excluding pu) be routed
        injectively: t_slots = [(host child w, edge label, char set)] of the
        CURRENT spanning tree below v; offers = per child block at v, a list
        of alternatives, each alternative = [(edge label, char set)] (≤2
        slots sharing one spanning tree of that block)."""
        kids = [(c, el) for c, el in p_adj[u] if c != pu]
        if not kids:
            return True
        if found[0]:
            return True

        used_t = [False] * len(t_slots)
        # chosen[i] = (alt_index, [slot_used_flags]) per offer block
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

    def process_vertex(v: int, down_offers: list, t_slots: list):
        """Characteristics of host vertex v given its spanning-tree child
        slots and the offers of its child blocks. Returns the (u, pu) char
        set; sets ``found`` when a full pattern embedding roots here."""
        chars = set()
        vl = g_vertices[v]
        for u in p_vertices:
            if p_vertices[u] != vl:
                continue
            # full pattern rooted at u
            if match_children(u, None, v, t_slots, down_offers):
                found[0] = True
                return chars
            for pu, _ in p_adj[u]:
                if match_children(u, pu, v, t_slots, down_offers):
                    chars.add((u, pu))
        return chars

    def process_block(bi: int, cut: int, seen_blocks: set):
        """Process block bi entered from cut vertex ``cut``; returns the
        OFFER list for the parent: one alternative per spanning tree, each
        [(edge label to cut-adjacent slot, char set of that slot)]."""
        bes = blocks[bi]
        members = {x for e in bes for x in e[:2]}
        # child blocks hanging below each member vertex (other than via cut)
        sub_offers: dict = {v: [] for v in members}
        for v in members:
            if v == cut:
                continue
            for cbi in v_blocks[v]:
                if cbi != bi and cbi not in seen_blocks:
                    seen_blocks.add(cbi)
                    sub_offers[v].append(
                        process_block(cbi, v, seen_blocks)
                    )
                    if found[0]:
                        return []
        if len(bes) == 1:  # bridge
            a, b, el = bes[0]
            w = b if a == cut else a
            chars = process_vertex(w, sub_offers[w], [])
            return [[(el, chars)]]
        # cycle block: enumerate spanning trees (remove each edge in turn)
        cyc = _cycle_order(bes)
        k = len(cyc)
        offers = []
        for rm in range(k):
            # remaining path after removing edge rm: order vertices so the
            # path hangs from ``cut``: two arms from cut to the removal gap
            kept = [cyc[(rm + 1 + i) % k] for i in range(k - 1)]
            # kept is a path: v_{rm+1} - v_{rm+2} - ... - v_{rm} (k vertices)
            path_vs = [kept[0][0]] + [e[1] for e in kept]
            ci = path_vs.index(cut)
            # arms: left = path before cut (reversed), right = after
            # process each arm leaf-to-cut computing chars chained
            def arm_chars(indices):
                # indices: list of path positions from cut outward
                prev_slot = None
                for j in reversed(range(len(indices))):
                    pi = indices[j]
                    v = path_vs[pi]
                    # edge between this vertex and the NEXT outward vertex
                    slots = [] if prev_slot is None else [prev_slot]
                    ch = process_vertex(v, sub_offers[v], slots)
                    if found[0]:
                        return None
                    # edge label between path_vs[pi] and its inward neighbor
                    inward = indices[j - 1] if j > 0 else ci
                    lo, hi = min(pi, inward), max(pi, inward)
                    el = kept[lo][2]
                    prev_slot = (v, el, ch)
                return prev_slot
            left = arm_chars(list(range(ci - 1, -1, -1)))
            if found[0]:
                return []
            right = arm_chars(list(range(ci + 1, len(path_vs))))
            if found[0]:
                return []
            alt = []
            for s in (left, right):
                if s is not None:
                    alt.append((s[1], s[2]))
            offers.append(alt)
        return offers

    # walk the block forest from each component's minimum vertex: treat the
    # root vertex as a final cut vertex consuming ALL its blocks' offers
    seen_blocks: set = set()
    comp_roots = sorted(g_vertices)
    visited_v: set = set()
    for r in comp_roots:
        if r in visited_v or found[0]:
            continue
        # mark the whole component visited
        stack = [r]
        visited_v.add(r)
        g_adj: dict = {}
        for a, b, _ in g_edges:
            g_adj.setdefault(a, []).append(b)
            g_adj.setdefault(b, []).append(a)
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
                    return True
        process_vertex(r, root_offers, [])
        if found[0]:
            return True
    return found[0]
