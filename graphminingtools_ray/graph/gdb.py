"""Per-graph measure kernels over a transactional graph DB — the engine's
re-expression of the reference's ``gf`` filter suite
(``/root/reference/executables/filter.c:386-533`` dispatch; measures cited
per function below).

Model: the graph DB is a pair of Datasets (``gdb_vertices``, ``gdb_edges``)
keyed by ``graph_id`` (FIXTURES.md §4). Per-graph work is a
``groupby(graph_id).map_groups`` kernel — each group is one small graph, the
streaming executor parallelizes across graphs exactly where the reference
streamed them serially.

Measures (column → reference):
    n, m                → header fields (filter.c:492-497)
    max_degree, min_degree → graph.c:611-650
    n_components        → listComponents.c:306-319 (getAndMarkConnectedComponents)
    connected           → connectedComponents.c:93-113 (isConnected; true for n==0)
    is_tree             → outerplanar.c:25-37 (connected ∧ m == n-1)
    is_path             → outerplanar.c:11-23 (tree ∧ degrees ≤ 2)
    n_bridges, n_blocks → listComponents.c:128-204 over Tarjan lowpoints
    n_self_loops        → ingest policy surface (FIXTURES §3 selfloop_dup)
    spanning_trees      → count semantics of listSpanningTrees.c:409-437,
                          computed via the matrix-tree theorem (Kirchhoff)
                          instead of enumeration; capped like the reference's
                          maxBound guard
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SPANNING_TREE_CAP = np.int64(2**62)

MEASURE_COLUMNS = [
    "graph_id", "n", "m", "max_degree", "min_degree", "n_components",
    "connected", "is_tree", "is_path", "n_bridges", "n_blocks",
    "n_self_loops", "spanning_trees", "n_simple_cycles", "n_bridge_trees",
    "max_blocks_per_component", "is_cactus",
    # round-2 kernel pack
    "is_outerplanar", "max_block_degree", "min_block_degree",
    "n_articulation_points",
    "spanning_tree_estimate", "n_noniso_cycles", "n_noniso_spanning_trees",
    # round-2b kernel pack: Hamiltonian-path / local-easiness family
    "is_traceable_cactus", "is_weakly_traceable",
    "min_local_easiness", "max_local_easiness",
]


def measures_for_graph(n: int, edges: list[tuple[int, int]]) -> dict:
    """Single-graph kernel. ``edges`` are 0-based undirected pairs (possibly
    with self-loops / multi-edges, which the measures treat explicitly)."""
    deg = np.zeros(n, dtype=np.int64)
    n_self = 0
    simple = set()
    adj: list[list[int]] = [[] for _ in range(n)]
    for v, w in edges:
        if v == w:
            n_self += 1
            continue
        deg[v] += 1
        deg[w] += 1
        adj[v].append(w)
        adj[w].append(v)
        simple.add((min(v, w), max(v, w)))
    m = len(edges)

    # connected components (iterative DFS)
    comp = np.full(n, -1, dtype=np.int64)
    n_components = 0
    for s in range(n):
        if comp[s] != -1:
            continue
        n_components += 1
        stack = [s]
        comp[s] = s
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if comp[w] == -1:
                    comp[w] = s
                    stack.append(w)

    connected = n_components <= 1  # true for the empty graph, like isConnected
    is_tree = connected and m == n - 1 and n_self == 0
    is_path = is_tree and (n == 0 or deg.max() <= 2)

    (n_bridges, n_blocks, bridge_edges, max_blocks, non_cycle_blocks,
     bcc_edge_lists) = _bridges_and_blocks(n, adj)
    # cactus: connected, and every biconnected block is a simple cycle or a
    # bridge (reference isCactus, outerplanar.c:39-69)
    is_cactus = bool(connected and non_cycle_blocks == 0 and n_self == 0 and n > 0)

    st = _spanning_tree_count(n, edges, comp, n_components)

    adj_simple = [set() for _ in range(n)]
    for v, w in simple:
        adj_simple[v].add(w)
        adj_simple[w].add(v)
    n_cycles, cycle_lengths = _count_simple_cycles(n, adj_simple)

    # round-2 kernels over the biconnected decomposition.
    # Two degree notions, both from the reference (listComponents.c:16-122):
    #   criticality (computeCriticality)  = #biconnected comps containing v,
    #     bridges INCLUDED — articulation points are criticality > 1;
    #   block degree (computeBlockDegrees) = #comps with m > 1 containing v,
    #     bridges EXCLUDED — feeds getMax/MinBlockDegree (filter.c:516-521),
    #     so a tree has max_block_degree 0.
    criticality = np.zeros(n, dtype=np.int64)
    block_deg = np.zeros(n, dtype=np.int64)
    for bes in bcc_edge_lists:
        members = {x for e in bes for x in e}
        for v in members:
            criticality[v] += 1
            if len(bes) > 1:
                block_deg[v] += 1
    max_block_degree = int(block_deg.max()) if n else 0
    min_block_degree = int(block_deg.min()) if n else 0
    n_articulation = int(np.count_nonzero(criticality > 1))
    is_outerplanar = all(_block_outerplanar(bes) for bes in bcc_edge_lists)
    st_estimate = _spanning_tree_estimate(bcc_edge_lists, n_components)
    n_noniso_st = _noniso_spanning_trees(n, sorted(simple), st, connected)

    trace_shape = _traceable_shape(criticality, bcc_edge_lists)
    is_traceable_cactus = bool(
        is_cactus and (n <= 1 or trace_shape == 2)
    )
    # weakly traceable: connected AND the necessary criticality conditions
    # hold (no block-adjacency check — may still be non-traceable)
    is_weakly_traceable = bool(connected and (n <= 1 or trace_shape >= 1))
    min_le, max_le = _local_easiness(n, bcc_edge_lists)

    return {
        "is_cactus": is_cactus,
        "n_simple_cycles": n_cycles,
        "n_bridge_trees": _n_bridge_trees(n, bridge_edges),
        "max_blocks_per_component": max_blocks,
        "n": n,
        "m": m,
        "max_degree": int(deg.max()) if n else 0,
        "min_degree": int(deg.min()) if n else 0,
        "n_components": n_components,
        "connected": bool(connected),
        "is_tree": bool(is_tree),
        "is_path": bool(is_path),
        "n_bridges": n_bridges,
        "n_blocks": n_blocks,
        "n_self_loops": n_self,
        "spanning_trees": int(st),
        "is_outerplanar": bool(is_outerplanar),
        "max_block_degree": max_block_degree,
        "min_block_degree": min_block_degree,
        "n_articulation_points": n_articulation,
        "spanning_tree_estimate": int(st_estimate),
        "n_noniso_cycles": len(cycle_lengths),
        "n_noniso_spanning_trees": int(n_noniso_st),
        "is_traceable_cactus": is_traceable_cactus,
        "is_weakly_traceable": is_weakly_traceable,
        "min_local_easiness": int(min_le),
        "max_local_easiness": int(max_le),
    }


def _bridges_and_blocks(n: int, adj: list[list[int]]):
    """Iterative Tarjan lowpoint DFS listing biconnected components.
    Reference semantics (listComponents.c:143-191):
      bridges = biconnected components with exactly 1 edge,
      blocks  = biconnected components with  more than 1 edge.
    Returns (n_bridges, n_blocks, bridge_edges, max_blocks_per_component,
    non_cycle_blocks, bcc_edge_lists) — the last item is the edge list of
    EVERY biconnected component (bridges included), feeding the round-2
    kernels (outerplanarity, block degree/criticality, ST estimate)."""
    disc = np.full(n, -1, dtype=np.int64)
    low = np.full(n, 0, dtype=np.int64)
    timer = 0
    n_bridges = 0
    n_blocks = 0
    non_cycle_blocks = 0
    bridge_edges: list[tuple[int, int]] = []
    bcc_edge_lists: list[list[tuple[int, int]]] = []
    max_blocks_per_comp = 0
    edge_stack: list[tuple[int, int]] = []

    for root in range(n):
        if disc[root] != -1:
            continue
        blocks_this_comp = 0
        # stack frames: (v, parent, iterator index, parent-edge-used flag)
        stack = [(root, -1, 0, False)]
        while stack:
            v, parent, idx, used_parent_edge = stack.pop()
            if idx == 0:
                disc[v] = low[v] = timer
                timer += 1
            advanced = False
            while idx < len(adj[v]):
                w = adj[v][idx]
                idx += 1
                if w == parent and not used_parent_edge:
                    used_parent_edge = True  # skip parent edge ONCE (parallel edges count)
                    continue
                if disc[w] == -1:
                    edge_stack.append((v, w))
                    stack.append((v, parent, idx, used_parent_edge))
                    stack.append((w, v, 0, False))
                    advanced = True
                    break
                elif disc[w] < disc[v]:
                    edge_stack.append((v, w))
                    low[v] = min(low[v], disc[w])
            if advanced:
                continue
            # v finished: pop its biconnected component if v closes one
            if parent != -1:
                if low[v] >= disc[parent]:
                    size = 0
                    block_verts = set()
                    block_edges: list[tuple[int, int]] = []
                    while edge_stack and edge_stack[-1] != (parent, v):
                        e = edge_stack.pop()
                        block_verts.update(e)
                        block_edges.append(e)
                        size += 1
                    if edge_stack:
                        e = edge_stack.pop()
                        block_verts.update(e)
                        block_edges.append(e)
                        size += 1
                    if size == 1:
                        n_bridges += 1
                        bridge_edges.append((parent, v))
                        bcc_edge_lists.append(block_edges)
                    elif size > 1:
                        n_blocks += 1
                        blocks_this_comp += 1
                        bcc_edge_lists.append(block_edges)
                        # a block is a simple cycle iff |E| == |V|
                        if size != len(block_verts):
                            non_cycle_blocks += 1
                low[parent] = min(low[parent], low[v])
        max_blocks_per_comp = max(max_blocks_per_comp, blocks_this_comp)
    return (n_bridges, n_blocks, bridge_edges, max_blocks_per_comp,
            non_cycle_blocks, bcc_edge_lists)


def _count_simple_cycles(n: int, adj_simple: list[set], cap: int = 100000):
    """Count simple cycles (length >= 3) by rooted backtracking: a cycle is
    counted at its minimum vertex, walking only through larger vertices;
    each cycle found twice (both directions) → /2. Reference semantics:
    numberOfSimpleCycles via Read–Tarjan listing (listCycles.c:386-425).
    Capped like the reference's maxBound guards.

    Also returns the SET OF CYCLE LENGTHS seen — on an unlabeled graph the
    canonical form of a simple cycle (min over rotations/reflections,
    ``cs_Cycle.c:94-174``) collapses to its length, so distinct lengths =
    non-isomorphic cycle count (``listCycles.c:57-119``); the labeled
    canonical-cycle form lives in functions.cstring.canonical_cycle."""
    count = 0
    lengths: set[int] = set()
    for start in range(n):
        # DFS over vertices > start, counting returns to start
        stack = [(start, iter(sorted(adj_simple[start])), {start})]
        path = [start]
        while stack:
            v, it, onpath = stack[-1]
            advanced = False
            for w in it:
                if w == start and len(path) >= 3:
                    count += 1
                    lengths.add(len(path))
                    if count >= 2 * cap:
                        return cap, lengths
                    continue
                if w > start and w not in onpath:
                    newset = onpath | {w}
                    stack.append((w, iter(sorted(adj_simple[w])), newset))
                    path.append(w)
                    advanced = True
                    break
            if not advanced:
                stack.pop()
                path.pop()
    return count // 2, lengths


def _outerplanar_embedding(block_edges: list[tuple[int, int]]):
    """Outerplanar embedding of ONE biconnected component (reference scope
    ``outerplanar.c:71-353``, Mitchell's recognition re-derived for the
    engine's small per-transaction blocks): a biconnected graph with ≥3
    vertices is outerplanar iff it has a Hamiltonian cycle (necessarily its
    UNIQUE outer face) whose chords are pairwise non-crossing. Bridges /
    single edges are trivially outerplanar. Exponential Hamilton search —
    fine for the small blocks this engine's transactions have; correctness
    does not depend on which Hamiltonian cycle is found (a crossing-free
    chord set for ANY Hamiltonian cycle is an outerplanar embedding, and an
    outerplanar biconnected graph has exactly one Hamiltonian cycle).

    Returns None when not outerplanar; otherwise
    ``(verts, cycle, chords)`` in ORIGINAL vertex ids, where ``cycle`` is
    the Hamiltonian-cycle vertex order (None for trivial ≤2-vertex blocks)
    and ``chords`` the non-cycle edges as (a, b) pairs."""
    verts = sorted({x for e in block_edges for x in e})
    nb = len(verts)
    if nb <= 2:
        return verts, None, []
    idx = {v: i for i, v in enumerate(verts)}
    adj = [set() for _ in range(nb)]
    eset = set()
    for a, b in block_edges:
        ia, ib = idx[a], idx[b]
        if ia == ib:
            continue
        adj[ia].add(ib)
        adj[ib].add(ia)
        eset.add((min(ia, ib), max(ia, ib)))
    # quick reject: outerplanar graphs have m <= 2n - 3
    if len(eset) > 2 * nb - 3:
        return None

    # Hamiltonian cycle search from vertex 0
    path = [0]
    onpath = {0}

    def ham(v: int) -> list[int] | None:
        if len(path) == nb:
            return list(path) if 0 in adj[v] else None
        for w in sorted(adj[v]):
            if w in onpath:
                continue
            path.append(w)
            onpath.add(w)
            got = ham(w)
            if got is not None:
                return got
            path.pop()
            onpath.discard(w)
        return None

    cyc = ham(0)
    if cyc is None:
        return None
    pos = {v: i for i, v in enumerate(cyc)}
    chords = []  # chord endpoints as CYCLE POSITIONS (for crossing check)
    chord_verts = []  # same chords as local vertex indices
    for a, b in eset:
        pa_, pb_ = pos[a], pos[b]
        if abs(pa_ - pb_) in (1, nb - 1):
            continue  # cycle edge
        chords.append((min(pa_, pb_), max(pa_, pb_)))
        chord_verts.append((a, b))
    for i in range(len(chords)):
        a1, b1 = chords[i]
        for j in range(i + 1, len(chords)):
            a2, b2 = chords[j]
            if (a1 < a2 < b1 < b2) or (a2 < a1 < b2 < b1):
                return None  # crossing chords
    return (
        verts,
        [verts[i] for i in cyc],
        [(verts[a], verts[b]) for a, b in chord_verts],
    )


def _block_outerplanar(block_edges: list[tuple[int, int]]) -> bool:
    return _outerplanar_embedding(block_edges) is not None


def _spanning_tree_estimate(bcc_edge_lists, n_components: int) -> int:
    """Cheap upper bound on the spanning-tree count (reference scope
    ``upperBoundsForSpanningTrees.c``): the block-cut decomposition is
    exact — #ST(G) = Π over biconnected components of #ST(block) — and each
    block is bounded by C(m_b, n_b−1) (every spanning tree is an
    (n_b−1)-subset of the block's edges). Disconnected graphs have 0
    spanning trees, like the exact measure. Capped at SPANNING_TREE_CAP."""
    from math import comb

    if n_components > 1:
        return 0
    est = 1
    for bes in bcc_edge_lists:
        nb = len({x for e in bes for x in e})
        est *= comb(len(bes), nb - 1)
        if est >= int(SPANNING_TREE_CAP):
            return int(SPANNING_TREE_CAP)
    return int(est)


def _noniso_spanning_trees(
    n: int, simple_edges: list[tuple[int, int]], st_count: int,
    connected: bool, enum_cap: int = 20000,
) -> int:
    """Number of pairwise non-isomorphic spanning trees
    (``listSpanningTrees.c:439-463``: enumerate, canonicalize, dedupe).
    Enumeration = (n−1)-edge subsets forming trees, identity = unlabeled
    canonical tree string. Guarded by the EXACT spanning-tree count: when
    enumeration would exceed ``enum_cap`` candidates, returns the cap
    sentinel (the reference saturates at maxBound the same way)."""
    from itertools import combinations

    from ..functions.cstring import canonical_tree_string

    if not connected or n == 0:
        return 0
    if n == 1:
        return 1
    m = len(simple_edges)
    if st_count > enum_cap:
        return enum_cap
    from math import comb

    if comb(m, n - 1) > 200000:
        return enum_cap
    seen = set()
    verts = {v: "x" for e in simple_edges for v in e}
    for sub in combinations(simple_edges, n - 1):
        c = canonical_tree_string(
            {v: "x" for v in verts}, [(a, b, "e") for a, b in sub]
        )
        if c is not None:
            seen.add(c)
    return len(seen)


def _traceable_shape(block_deg: np.ndarray, bcc_edge_lists) -> int:
    """Hamiltonian-path structure tests on the block decomposition
    (reference ``hp_cactus.c:23-113`` isThisCactusTraceable and
    ``hp_cactus.c:126-174`` isWeaklyTraceableUnsafe). ``block_deg`` is the
    per-vertex criticality (number of biconnected components containing the
    vertex, ``listComponents.c computeCriticality``).

    Returns 0 if the necessary conditions fail (some vertex criticality > 2,
    or some multi-edge block has > 2 critical vertices), 1 if only the weak
    conditions hold, 2 if additionally in every multi-edge block with exactly
    two critical vertices those two are adjacent (the strong condition that
    makes a connected CACTUS traceable)."""
    if block_deg.size and int(block_deg.max()) > 2:
        return 0
    strong = 2
    for bes in bcc_edge_lists:
        if len(bes) <= 1:
            continue
        crit = {v for e in bes for v in e if block_deg[v] > 1}
        if len(crit) > 2:
            return 0
        if len(crit) == 2:
            a, b = sorted(crit)
            if not any({x, y} == {a, b} for x, y in bes):
                strong = 1  # weak conditions hold, strong adjacency fails
    return strong


def _local_easiness(
    n: int, bcc_edge_lists, max_bound: int = 2**31 - 1
) -> tuple[int, int]:
    """Per-vertex local easiness = product of spanning-tree counts of the
    multi-edge biconnected blocks containing the vertex (reference
    ``localEasiness.c:10-58`` computeLocalEasinessExactly; bridges contribute
    factor 1). Returns (min, max) over vertices with the reference's INT_MAX
    sentinel semantics (``localEasiness.c:66-107``): a count above
    ``max_bound`` poisons the vertex (max → -1; min skips it), and a final
    value above INT_MAX reports -1."""
    if n == 0:
        return -1, -1
    easiness = [1] * n
    for bes in bcc_edge_lists:
        if len(bes) <= 1:
            continue
        verts = sorted({v for e in bes for v in e})
        idx = {v: i for i, v in enumerate(verts)}
        nb = len(verts)
        L = [[0] * nb for _ in range(nb)]
        for a, b in bes:
            ia, ib = idx[a], idx[b]
            L[ia][ia] += 1
            L[ib][ib] += 1
            L[ia][ib] -= 1
            L[ib][ia] -= 1
        st = _bareiss_det([row[1:] for row in L[1:]])
        for v in verts:
            if st > max_bound:
                easiness[v] = 0  # poisoned, like countSpanningTrees == -1
            elif easiness[v] != 0:
                easiness[v] *= st
    int_max = 2**31 - 1
    mx = -1
    mn = -1
    poisoned = False
    for v in range(n):
        if easiness[v] == 0:
            poisoned = True  # getMaxLocalEasiness returns -1 on any failure
            continue
        if easiness[v] > mx:
            mx = easiness[v]
        if mn == -1 or easiness[v] < mn:
            mn = easiness[v]
    if poisoned or mx > int_max:
        mx = -1
    if mn > int_max:
        mn = -1
    return mn, mx


def _n_bridge_trees(n: int, bridge_edges: list[tuple[int, int]]) -> int:
    """Connected components of (V, bridges) — the graph with all block
    edges removed (listComponents.c getNumberOfBridgeTrees)."""
    parent = list(range(n))

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    comps = n
    for v, w in bridge_edges:
        rv, rw = find(v), find(w)
        if rv != rw:
            parent[rv] = rw
            comps -= 1
    return comps


def _bareiss_det(M: list[list[int]]) -> int:
    """Exact integer determinant via fraction-free Bareiss elimination
    (public algorithm; all intermediate divisions are exact). Python ints so
    no overflow — the per-order graphs this runs on are tiny."""
    n = len(M)
    if n == 0:
        return 1
    sign = 1
    prev = 1
    for k in range(n - 1):
        if M[k][k] == 0:
            for r in range(k + 1, n):
                if M[r][k] != 0:
                    M[k], M[r] = M[r], M[k]
                    sign = -sign
                    break
            else:
                return 0
        for i in range(k + 1, n):
            for j in range(k + 1, n):
                M[i][j] = (M[i][j] * M[k][k] - M[i][k] * M[k][j]) // prev
            M[i][k] = 0
        prev = M[k][k]
    return sign * M[n - 1][n - 1]


def _spanning_tree_count(n, edges, comp, n_components) -> int:
    """Matrix-tree theorem per component; product across components of a
    disconnected graph is 0 spanning trees (whole graph), matching the
    'spanning tree of the graph' semantics; for connected graphs the count.
    EXACT (integer Bareiss determinant — no float64 2^53 cliff), capped at
    SPANNING_TREE_CAP (reference caps via maxBound)."""
    if n == 0:
        return 1
    if n_components > 1:
        return 0
    if n == 1:
        return 1
    L = [[0] * n for _ in range(n)]
    for v, w in edges:
        if v == w:
            continue
        L[v][v] += 1
        L[w][w] += 1
        L[v][w] -= 1
        L[w][v] -= 1
    minor = [row[1:] for row in L[1:]]
    det = _bareiss_det(minor)
    return int(min(det, int(SPANNING_TREE_CAP)))


def _group_kernel(g: pd.DataFrame) -> pd.DataFrame:
    gid = g["graph_id"].iloc[0]
    verts = g[g["kind"] == "v"]
    edges_df = g[g["kind"] == "e"]
    vids = sorted(verts["a"].astype(int).tolist())
    index = {v: i for i, v in enumerate(vids)}
    edges = [
        (index[int(r.a)], index[int(r.b)]) for r in edges_df.itertuples()
    ]
    out = measures_for_graph(len(vids), edges)
    out["graph_id"] = gid
    return pd.DataFrame([out])[MEASURE_COLUMNS]


def graph_measures(gdb_vertices: rd.Dataset, gdb_edges: rd.Dataset) -> rd.Dataset:
    """Per-graph measures Dataset. Vertices and edges are unioned into one
    tagged long table so a single groupby(graph_id) sees both (isolated
    vertices count — connectedComponents.c:57-62)."""
    v_rows = gdb_vertices.map_batches(
        lambda t: pa.table(
            {
                "graph_id": t["graph_id"].cast(pa.int64()),
                "a": t["vertex_id"].cast(pa.int64()),
                "b": pa.nulls(t.num_rows, pa.int64()),
                "kind": pa.array(["v"] * t.num_rows),
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
                "kind": pa.array(["e"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )
    def per_bucket(t: pa.Table) -> pd.DataFrame:
        # one exchange task per hash bucket of graph_ids; the per-graph
        # kernel runs in a plain pandas loop inside the bucket — Ray's
        # per-group map_groups machinery costs ~ms per group, which
        # dominates at corpus scale (thousands of small graphs per task)
        df = t.to_pandas()
        outs = [_group_kernel(g) for _, g in df.groupby("graph_id", sort=True)]
        return pd.concat(outs, ignore_index=True)

    from ..functions.bucketing import bucketed_group_combine

    return bucketed_group_combine(v_rows.union(e_rows), ["graph_id"], per_bucket)


# --- the gf filter DSL (executables/filter.h dispatch re-expressed) ---------

_COMPARATORS = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "pass": lambda a, b: a == a,
}


def filter_graphs(
    measures: rd.Dataset,
    measure: str,
    cmp: str = "pass",
    value: int | float | bool = 0,
    projection: str = "id",
):
    """``gf``-style: keep graphs where measure ⟨cmp⟩ value, project output
    (filter.c:540-586: comparators eq/neq/leq/geq/less/greater/pass;
    projections id | value | id+value)."""
    if cmp not in _COMPARATORS:
        raise ValueError(f"unknown comparator {cmp!r}")
    op = {"==": "==", "!=": "!=", "<=": "<=", ">=": ">=", "<": "<", ">": ">"}
    if cmp == "pass":
        kept = measures
    else:
        kept = measures.filter(expr=f"{measure} {op[cmp]} {value!r}")
    if projection == "id":
        return kept.select_columns(["graph_id"])
    if projection == "value":
        return kept.select_columns([measure])
    if projection == "id+value":
        return kept.select_columns(["graph_id", measure])
    if projection == "all":
        return kept
    raise ValueError(f"unknown projection {projection!r}")


def vertex_cycle_degrees(
    gdb_vertices: rd.Dataset, gdb_edges: rd.Dataset
) -> rd.Dataset:
    """Per-VERTEX cycle degrees — the reference's ``ccd`` executable output
    mode 'a' (``executables/countCycleDegree.c``; kernel
    ``listComponents.c:52-88`` computeBlockDegrees): cycle degree of v =
    number of NONTRIVIAL (m > 1) biconnected components containing v.
    -> Dataset (graph_id, vertex_id, cycle_degree). Same exchange shape as
    ``graph_measures`` (one bucketed exchange keyed on graph_id)."""
    from ..functions.bucketing import bucketed_group_combine

    v_rows = gdb_vertices.map_batches(
        lambda t: pa.table(
            {
                "graph_id": t["graph_id"].cast(pa.int64()),
                "a": t["vertex_id"].cast(pa.int64()),
                "b": pa.nulls(t.num_rows, pa.int64()),
                "kind": pa.array(["v"] * t.num_rows),
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
                "kind": pa.array(["e"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )

    def per_bucket(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        outs = []
        for gid, g in df.groupby("graph_id", sort=True):
            verts = g[g["kind"] == "v"]
            edges_df = g[g["kind"] == "e"]
            vids = sorted(verts["a"].astype(int).tolist())
            index = {v: i for i, v in enumerate(vids)}
            n = len(vids)
            adj: list[list[int]] = [[] for _ in range(n)]
            for r in edges_df.itertuples():
                a, b = index[int(r.a)], index[int(r.b)]
                if a != b:
                    adj[a].append(b)
                    adj[b].append(a)
            (_, _, _, _, _, bcc_edge_lists) = _bridges_and_blocks(n, adj)
            cyc = np.zeros(n, dtype=np.int64)
            for bes in bcc_edge_lists:
                if len(bes) > 1:
                    for v in {x for e in bes for x in e}:
                        cyc[v] += 1
            outs.append(
                pd.DataFrame(
                    {
                        "graph_id": np.full(n, int(gid), np.int64),
                        "vertex_id": np.array(vids, np.int64),
                        "cycle_degree": cyc,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_combine(v_rows.union(e_rows), ["graph_id"], per_bucket)


def with_random_sample(measures: rd.Dataset, seed: int = 42) -> rd.Dataset:
    """Append the ``random_sample`` measure — the reference's
    ``gf -f randomSample`` (filter.c:398: ``measure = rand() % 1000``; the
    comparator/value pair then keeps e.g. ``< 100`` ≈ 10%). Engine version
    is a seeded multiplicative hash of graph_id into [0, 1000): deterministic
    across runs, workers and partitionings (the reference's ``rand()`` is
    stream-order-dependent — a serial artifact we must not copy)."""
    def add(t: pa.Table) -> pa.Table:
        g = t["graph_id"].to_numpy().astype(np.uint64)
        h = (g + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(32)
        return t.append_column(
            "random_sample", pa.array((h % np.uint64(1000)).astype(np.int64))
        )

    return measures.map_batches(add, batch_format="pyarrow")
