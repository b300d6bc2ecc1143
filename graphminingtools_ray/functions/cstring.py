"""Canonical string of a labeled tree — the reference suite's dedup key and
pattern identity (format from ``/root/reference/doc/content/pages/
fileformat.md:56-95``; reference impl ``cs_Tree.c:342-366`` roots at the tree
center, rooted encoding ``cs_Tree.c:24-126``).

Encoding (matches the documented grammar exactly, including the mandatory
trailing space): a rooted tree serializes as

    <vertex_label> ␣ { ( ␣ <edge_label> ␣ <subtree> ) ␣ }*

with the child blocks sorted lexicographically (deterministic and
isomorphism-invariant; the reference's total order is its own
``compareCanonicalStrings`` — any fixed total order yields a canonical form,
we use byte order of the serialized block). The unrooted canonical string
roots at the tree center (1 or 2 candidates after leaf peeling) and takes
the lexicographically smaller result.

Returns ``None`` for non-trees (the ``cstring`` executable prints "No Tree").
"""

from __future__ import annotations


def tree_centers(n: int, adj: dict[int, list]) -> list[int]:
    """Leaf-peeling centers (1 or 2 vertices) of a tree given adjacency."""
    if n == 1:
        return list(adj.keys())
    degree = {v: len(ws) for v, ws in adj.items()}
    layer = [v for v, d in degree.items() if d <= 1]
    remaining = n
    while remaining > 2:
        nxt = []
        remaining -= len(layer)
        for v in layer:
            degree[v] = 0
            for w, _ in adj[v]:
                if degree[w] > 1:
                    degree[w] -= 1
                    if degree[w] == 1:
                        nxt.append(w)
        layer = nxt
    return sorted(layer)


def rooted_cstring(root: int, adj: dict[int, list], vlabel: dict[int, str]) -> str:
    def enc(v: int, parent: int) -> str:
        blocks = sorted(
            f"( {elabel} {enc(w, v)}) "
            for w, elabel in adj[v]
            if w != parent
        )
        return f"{vlabel[v]} " + "".join(blocks)

    return enc(root, -1)


def canonical_tree_string(
    vertices: dict[int, str], edges: list[tuple[int, int, str]]
) -> str | None:
    """vertices: vertex_id -> label; edges: (v, w, edge_label) undirected,
    stored once. None if not a tree (disconnected / cycle / self-loop)."""
    n = len(vertices)
    if n == 0:
        return None
    if len(edges) != n - 1:
        return None
    adj: dict[int, list] = {v: [] for v in vertices}
    for v, w, el in edges:
        if v == w or v not in adj or w not in adj:
            return None
        adj[v].append((w, el))
        adj[w].append((v, el))
    # connectivity check (m == n-1 ∧ connected ⇔ tree)
    seen = {next(iter(adj))}
    stack = [next(iter(adj))]
    while stack:
        v = stack.pop()
        for w, _ in adj[v]:
            if w not in seen:
                seen.add(w)
                stack.append(w)
    if len(seen) != n:
        return None
    return min(
        rooted_cstring(c, adj, vertices) for c in tree_centers(n, adj)
    )


def canonical_rooted_tree_string(
    vertices: dict[int, str], edges: list[tuple[int, int, str]]
) -> str | None:
    """Canonical string of a ROOTED labeled tree — the rooted-mining pattern
    identity (reference ``cs_Tree.c:24-126`` canonicalStringOfRootedTree, as
    used by ``lwmr`` / treeEnumerationRooted.c:91): same grammar as the
    unrooted form but serialized from the structural root (NO center
    finding — rooted trees with the same shape but different roots are
    distinct patterns). ``edges`` are DIRECTED (parent, child, edge_label);
    the root is the unique in-degree-0 vertex. Returns None when the input
    is not an out-tree (multiple roots / a vertex with two parents / a
    cycle / disconnected). ``parse_cstring`` is the exact inverse: it
    returns vertices in parse order with the root at id 0 and edges as
    (parent, child, label)."""
    n = len(vertices)
    if n == 0 or len(edges) != n - 1:
        return None
    indeg = {v: 0 for v in vertices}
    children: dict[int, list] = {v: [] for v in vertices}
    for p, c, el in edges:
        if p == c or p not in children or c not in children:
            return None
        indeg[c] += 1
        children[p].append((c, el))
    roots = [v for v in vertices if indeg[v] == 0]
    if len(roots) != 1 or any(d > 1 for d in indeg.values()):
        return None
    root = roots[0]
    # reachability from the root rules out a directed cycle living beside it
    seen = {root}
    stack = [root]
    while stack:
        v = stack.pop()
        for c, _ in children[v]:
            if c not in seen:
                seen.add(c)
                stack.append(c)
    if len(seen) != n:
        return None

    def enc(v: int) -> str:
        blocks = sorted(f"( {el} {enc(c)}) " for c, el in children[v])
        return f"{vertices[v]} " + "".join(blocks)

    return enc(root)


def canonical_cycle(vlabels: list[str], elabels: list[str]) -> str:
    """Canonical string of a labeled simple cycle — reference semantics
    (``cs_Cycle.c:94-174``): the cycle visits vertices v0..v_{k-1} with
    edge i connecting v_i to v_{i+1 mod k}; the canonical form is the
    lexicographic minimum of the interleaved label sequence over ALL
    rotations and both directions. Length-only degenerate form on unlabeled
    input (all labels equal) — which is why the gdb non-iso cycle measure
    reduces to distinct lengths there."""
    k = len(vlabels)
    if k == 0 or len(elabels) != k:
        raise ValueError("cycle needs k vertex labels and k edge labels")
    best = None
    for direction in (1, -1):
        if direction == 1:
            vs, es = vlabels, elabels
        else:
            # reversed walk v0, v_{k-1}, ..., v1: vs_rev[i] = v_{(k-1-i)%k}
            # pairs with the edge INTO the next vertex: es_rev[i] = e_{(k-2-i)%k}
            vs = [vlabels[(k - 1 - i) % k] for i in range(k)]
            es = [elabels[(k - 2 - i) % k] for i in range(k)]
        for r in range(k):
            seq = []
            for i in range(k):
                seq.append(vs[(r + i) % k])
                seq.append(es[(r + i) % k])
            s = " ".join(seq)
            if best is None or s < best:
                best = s
    return best


def parse_cstring(s: str):
    """Inverse of the encoding: -> (vertices: {id: label}, edges list).
    Vertex ids are assigned in parse order starting at 0."""
    tokens = s.split()
    vertices: dict[int, str] = {}
    edges: list[tuple[int, int, str]] = []
    pos = 0

    def parse_vertex() -> int:
        nonlocal pos
        vid = len(vertices)
        vertices[vid] = tokens[pos]
        pos += 1
        while pos < len(tokens) and tokens[pos] == "(":
            pos += 1  # '('
            elabel = tokens[pos]
            pos += 1
            child = parse_vertex()
            edges.append((vid, child, elabel))
            assert tokens[pos] == ")", f"expected ')' at {pos}"
            pos += 1
        return vid

    parse_vertex()
    return vertices, edges
