"""Outerplanar block-and-bridge-tree kernel (the reference's ``opk``
executable, ``/root/reference/opk.c:19-100``):

1. Decompose each transaction graph into biconnected components
   (``listComponents.c``); components with one edge are bridges, the rest
   are blocks.
2. Build the block-and-bridge tree (``outerplanar.c:456-641``
   ``createBlockAndBridgeTree``): original vertices survive iff they are
   incident to a bridge, belong to ≥2 biconnected components, or are
   isolated; every block collapses to a single block-vertex labeled with
   the canonical string of the block (which must be OUTERPLANAR — one
   non-outerplanar block disqualifies the whole graph, opk.c:30 ``if
   (bbTree)``), connected to each surviving contained vertex by a
   containment edge labeled ``#`` (``outerplanar.c:436-443``).
3. Enumerate depth-bounded BFS subtrees of the BB-tree rooted at every
   node (``treeKernels.c:91-119`` bfsSubtreeEnumeration): for each root
   and each radius j = 1..min(depth, ecc(root)), the canonical string of
   the radius-j ball (in a forest the BFS level tree IS the induced ball).
   The reference runs TWO enumerations over the same shared structure —
   opk.c:32 roots at the surviving original vertices, opk.c:38 roots at the
   block vertices (whose reverse containment edges walk back into the tree,
   outerplanar.c:625-635) — whose union is exactly "every BB-tree node as a
   root", which is how we enumerate.

Deviations from the reference, for parity auditing:
- The block canonical string is the ENGINE's encoding, not
  ``cs_Outerplanar.c``'s byte format: lexicographic minimum over the 2k
  rotations/reflections of the unique Hamiltonian cycle of the interleaved
  vertex/edge label walk plus the chord set in rotated positions.
  Isomorphism-invariance (the actual contract) is oracle-tested.
- ``bfsSubtreeEnumeration`` caps maxDepth by the eccentricity of the
  CURRENT root but writes the cap back into the shared variable, silently
  truncating every LATER root's enumeration depth (treeKernels.c:103-105,
  order-dependent). We cap per root — the evidently intended semantics.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..functions.bucketing import bucketed_group_combine
from ..functions.cstring import rooted_cstring
from ..graph.gdb import _bridges_and_blocks, _outerplanar_embedding

CONTAINMENT_LABEL = "#"  # outerplanar.c:436-443 getContainmentEdge


def canonical_outerplanar_string(
    block_edges: list[tuple[int, int]],
    vlabel: dict[int, str],
    elabel: dict[tuple[int, int], str],
) -> str | None:
    """Canonical string of one biconnected outerplanar component, None when
    the component is not outerplanar (reference scope
    ``cs_Outerplanar.c`` canonicalStringOfOuterplanarGraph — engine
    encoding, see module docstring). ``elabel`` keys are (min, max) pairs."""
    emb = _outerplanar_embedding(block_edges)
    if emb is None:
        return None
    verts, cyc, chords = emb
    if cyc is None:  # trivial block: single edge (or vertex)
        if len(verts) == 2:
            a, b = verts
            la, lb = sorted((vlabel[a], vlabel[b]))
            return f"E {la} {elabel[(min(a, b), max(a, b))]} {lb}"
        return f"V {vlabel[verts[0]]}"
    k = len(cyc)

    def el(a: int, b: int) -> str:
        return elabel[(min(a, b), max(a, b))]

    best = None
    for direction in (1, -1):
        walk_base = cyc if direction == 1 else cyc[::-1]
        for r in range(k):
            walk = [walk_base[(r + i) % k] for i in range(k)]
            pos = {v: i for i, v in enumerate(walk)}
            seq = []
            for i in range(k):
                seq.append(vlabel[walk[i]])
                seq.append(el(walk[i], walk[(i + 1) % k]))
            chord_code = sorted(
                (min(pos[a], pos[b]), max(pos[a], pos[b]), el(a, b))
                for a, b in chords
            )
            s = " ".join(seq) + " | " + " ".join(
                f"{i}-{j}:{le}" for i, j, le in chord_code
            )
            if best is None or s < best:
                best = s
    return best


def bb_tree(
    vertices: dict[int, str], edges: list[tuple[int, int, str]]
):
    """Block-and-bridge tree of one transaction graph
    (``outerplanar.c:456-641``). Returns ``(adj, nlabel, block_labels)``
    where ``adj[node] = [(neighbor, edge_label), ...]`` over surviving
    original vertices plus block nodes -(i+1), ``nlabel`` maps every node to
    its label (block nodes carry the block canonical string), and
    ``block_labels`` is the list of block canonical strings (the reference's
    separate ``blocks`` enumeration). None when any block is not
    outerplanar (opk contributes nothing for the graph, opk.c:30)."""
    verts = sorted(vertices)
    idx = {v: i for i, v in enumerate(verts)}
    adj_i: list[list[int]] = [[] for _ in verts]
    emap: dict[tuple[int, int], str] = {}
    for a, b, le in edges:
        if a == b:
            continue
        adj_i[idx[a]].append(idx[b])
        adj_i[idx[b]].append(idx[a])
        emap[(min(a, b), max(a, b))] = le
    _, _, bridge_edges, _, _, bcc = _bridges_and_blocks(len(verts), adj_i)

    blocks = []  # (original-id edge list) per block (>1 edge)
    bridges = []  # (a, b) original ids
    for comp in bcc:
        oe = [(verts[i], verts[j]) for i, j in comp]
        if len(oe) == 1:
            bridges.append(oe[0])
        else:
            blocks.append(oe)

    block_labels = []
    for be in blocks:
        c = canonical_outerplanar_string(be, vertices, emap)
        if c is None:
            return None
        block_labels.append(c)

    in_blocks: dict[int, list[int]] = {}  # vertex -> block indices
    for bi, be in enumerate(blocks):
        for v in sorted({x for e in be for x in e}):
            in_blocks.setdefault(v, []).append(bi)
    bridge_touch = {x for e in bridges for x in e}
    degree = {v: len(adj_i[idx[v]]) for v in verts}

    keep = {
        v
        for v in verts
        if v in bridge_touch
        or len(in_blocks.get(v, [])) >= 2
        or degree[v] == 0
    }

    adj: dict[int, list] = {v: [] for v in keep}
    nlabel: dict[int, str] = {v: vertices[v] for v in keep}
    for bi, lab in enumerate(block_labels):
        node = -(bi + 1)
        adj[node] = []
        nlabel[node] = lab
    for a, b in bridges:
        le = emap[(min(a, b), max(a, b))]
        adj[a].append((b, le))
        adj[b].append((a, le))
    for bi, be in enumerate(blocks):
        node = -(bi + 1)
        for v in sorted({x for e in be for x in e}):
            if v in keep:
                adj[v].append((node, CONTAINMENT_LABEL))
                adj[node].append((v, CONTAINMENT_LABEL))
    return adj, nlabel, block_labels


def ball_features(
    adj: dict[int, list], nlabel: dict[int, str], depth: int
) -> list[str]:
    """bfsSubtreeEnumeration over a forest: for every node v and every
    radius j = 1..min(depth, ecc(v)), the rooted canonical string of the
    radius-j ball around v. depth=-1 means unbounded (reference -1 → n)."""
    out: list[str] = []
    for v in sorted(adj):
        dist = {v: 0}
        frontier = [v]
        while frontier:
            nxt = []
            for w in frontier:
                for x, _ in adj[w]:
                    if x not in dist:
                        dist[x] = dist[w] + 1
                        nxt.append(x)
            frontier = nxt
        ecc = max(dist.values())
        cap = ecc if depth < 0 else min(depth, ecc)
        for j in range(1, cap + 1):
            ball_adj = {
                w: [(x, le) for x, le in adj[w] if dist[x] <= j]
                for w in adj
                if dist.get(w, j + 1) <= j
            }
            out.append(rooted_cstring(v, ball_adj, nlabel))
    return out


def opk_graph_features(
    vertices: dict[int, str],
    edges: list[tuple[int, int, str]],
    depth: int = 3,
) -> list[tuple[str, str]] | None:
    """One graph's opk feature multiset: (kind, feature) with kind
    ``tree`` (BB-tree BFS subtree) or ``block`` (block canonical string).
    None when some block is not outerplanar."""
    t = bb_tree(vertices, edges)
    if t is None:
        return None
    adj, nlabel, block_labels = t
    feats = [("tree", f) for f in ball_features(adj, nlabel, depth)]
    # engine addition (documented): the bare block dictionary as explicit
    # radius-0 features, so a pure-cycle graph (whose block node is isolated
    # in the BB-tree) still contributes its block identity
    feats.extend(("block", lab) for lab in block_labels)
    return feats


def outerplanarity_json_rows(graph_edges: rd.Dataset) -> rd.Dataset:
    """The ``outerplanaritytest`` executable's JSON output
    (``executables/outerplanaritytest.c``, format per
    ``outerplanaritytestHelp.txt``): one object per graph,
    ``{"graph": id, "hamiltonianCycles": {blockNo: [vertex ids, arbitrary
    start]}, "isOuterplanar": bool}`` — the cycle map may be non-empty even
    for non-outerplanar graphs (it holds the cycles of the outerplanar
    blocks). Block numbering is engine decomposition order (the reference's
    is traversal order — both arbitrary but deterministic). Returns a
    Dataset of (graph_id, json) rows; write with ``ds.write_json``."""
    import json as _json

    def per_graph(t: pa.Table) -> pa.Table:
        from .patterns import _graph_structs

        df = t.to_pandas()
        gids, docs = [], []
        for gid, g in df.groupby("graph_id", sort=False):
            vertices, gedges = _graph_structs(g)
            verts = sorted(vertices)
            idx = {v: i for i, v in enumerate(verts)}
            adj_i: list[list[int]] = [[] for _ in verts]
            for a, b, _le in gedges:
                if a == b:
                    continue
                adj_i[idx[a]].append(idx[b])
                adj_i[idx[b]].append(idx[a])
            _, _, _, _, _, bcc = _bridges_and_blocks(len(verts), adj_i)
            cycles: dict[str, list[int]] = {}
            outerplanar = True
            bno = 0
            for comp in bcc:
                if len(comp) == 1:
                    continue  # bridge: no cycle, never disqualifies
                bno += 1
                emb = _outerplanar_embedding(
                    [(verts[i], verts[j]) for i, j in comp]
                )
                if emb is None:
                    outerplanar = False
                    continue
                _, cyc, _ = emb
                cycles[str(bno)] = cyc
            gids.append(int(gid))
            docs.append(
                _json.dumps(
                    {
                        "graph": int(gid),
                        "hamiltonianCycles": cycles,
                        "isOuterplanar": outerplanar,
                    },
                    sort_keys=True,
                )
            )
        return pa.table(
            {
                "graph_id": pa.array(gids, pa.int64()),
                "json": pa.array(docs, pa.string()),
            }
        )

    return bucketed_group_combine(graph_edges, ["graph_id"], per_graph)


def opk_features(sf_dir: str, depth: int = 3) -> rd.Dataset:
    """Distributed opk feature map over the per-order graph DB: one row per
    (graph_id, kind, feature) with the within-graph multiplicity ``count``
    (the sparse vector the opk executable prints, opk.c:86-99). Graphs with
    a non-outerplanar block emit no rows. One bucketed exchange keyed on
    graph_id; global feature ids are hashes/strings, order-free."""
    from .mining import order_graph_edges_full
    from .patterns import _graph_structs

    def per_graph(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        gids, kinds, feats, counts = [], [], [], []
        for gid, g in df.groupby("graph_id", sort=False):
            vertices, gedges = _graph_structs(g)
            fs = opk_graph_features(vertices, gedges, depth=depth)
            if fs is None:
                continue
            agg: dict[tuple[str, str], int] = {}
            for kf in fs:
                agg[kf] = agg.get(kf, 0) + 1
            for (kind, f), c in sorted(agg.items()):
                gids.append(int(gid))
                kinds.append(kind)
                feats.append(f)
                counts.append(c)
        return pa.table(
            {
                "graph_id": pa.array(gids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "feature": pa.array(feats, pa.string()),
                "count": pa.array(counts, pa.int64()),
            }
        )

    return bucketed_group_combine(
        order_graph_edges_full(sf_dir), ["graph_id"], per_graph
    )
