"""Pattern-based feature extraction — engine analog of the reference's
``gpe`` / ``tpk`` / ``cpk`` executables:

- ``pattern_feature_table``: broadcast a tree-pattern list, probe each
  transaction graph with the exact subtree-embedding operator, emit sparse
  (graph_id, pattern_id) presence rows
  (``/root/reference/executables/patternExtractor.c:208-263``
  ``treePatterns`` mode; the reference probes with its subtree-iso DP, we
  use ``algos.subtree_iso``).
- ``cyclic_pattern_features``: the cyclic-pattern-kernel feature map of
  Horváth, Gärtner, Wrobel (KDD 2004 — public algorithm; reference
  ``cpk.c:17-100``): per graph, the SET of canonical strings of its simple
  cycles plus the canonical strings of its bridge-forest trees.
- ``tree_pattern_features``: ``tpk`` shape — frequent trees mined by
  ``levelwise_tree_mining`` become the pattern set, then the gpe probe.
- ``pattern_gram``: intersection kernel K[i,j] = |F_i ∩ F_j| over a small
  graph sample (the kernel the cpk/tpk executables output).

Distributed shape: patterns broadcast (``ray.put``, small side); per-graph
work inside ONE bucketed exchange keyed on graph_id; sparse feature rows are
the output (the libSVM sink in pipelines.sink serializes them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.bucketing import bucketed_group_combine
from .mining import order_graph_edges_full


def _graph_structs(df: pd.DataFrame):
    """One order-graph group -> (vertices {id: label}, edges [(a,b,el)])."""
    vertices: dict[int, str] = {}
    edges = []
    for r in df.itertuples():
        vertices[int(r.va)] = r.ba
        vertices[int(r.vb)] = r.bb
        edges.append((int(r.va), int(r.vb), r.le))
    return vertices, edges


def _triple_ids(vertices: dict, edges: list) -> np.ndarray:
    """Stable int ids of a graph's undirected labeled edge triples — the
    bloom-filter elements (the reference docks frequent vertex/edge pattern
    ids the same way, lwm_initAndCollect.c histograms + bloomFilter.h)."""
    from ..functions.hashing import stable_id64

    trips = [
        f"{min(vertices[a], vertices[b])}|{el}|{max(vertices[a], vertices[b])}"
        for a, b, el in edges
    ]
    return stable_id64(trips) if trips else np.empty(0, np.int64)


def pattern_feature_table(
    graph_edges: rd.Dataset, patterns: list[str]
) -> rd.Dataset:
    """Sparse presence features: (graph_id, pattern_id, pattern) rows for
    every (graph, pattern) where the tree pattern embeds in the graph.
    ``patterns`` are reference-format canonical tree strings.

    Each graph's edge-triple docking bits (functions.bloom — the
    reference's ``bloomFilter.c`` pruning array) gate the exact embedding
    operator: a pattern whose fingerprint is not a subset of the graph's
    bits cannot embed and is skipped without running the DP."""
    from ..algos.subtree_iso import tree_in_graph
    from ..functions.bloom import fingerprint, is_subset
    from ..functions.cstring import parse_cstring

    parsed = []
    for i, p in enumerate(sorted(patterns)):
        pv, pe = parse_cstring(p)
        fp = fingerprint(_triple_ids(pv, pe))
        parsed.append((i, p, (pv, pe), fp))
    pat_ref = ray.put(parsed)

    def probe(t: pa.Table) -> pa.Table:
        pats = ray.get(pat_ref)
        df = t.to_pandas()
        gids, pids, pstrs = [], [], []
        for gid, g in df.groupby("graph_id", sort=False):
            vertices, edges = _graph_structs(g)
            from ..functions.bloom import docking_bits

            _, gbits = docking_bits(
                np.zeros(len(edges), np.int64), _triple_ids(vertices, edges)
            )
            bits = gbits[0] if len(gbits) else np.uint64(0)
            for i, p, (pv, pe), fp in pats:
                if not is_subset(fp, np.array([bits]))[0]:
                    continue  # bloom prune: a needed triple class is absent
                if tree_in_graph(pv, pe, vertices, edges):
                    gids.append(int(gid))
                    pids.append(i)
                    pstrs.append(p)
        return pa.table(
            {
                "graph_id": pa.array(gids, pa.int64()),
                "pattern_id": pa.array(pids, pa.int64()),
                "pattern": pa.array(pstrs, pa.string()),
            }
        )

    return bucketed_group_combine(graph_edges, ["graph_id"], probe)


def _cycle_features(vertices: dict, edges: list) -> set[str]:
    """Canonical strings of all simple cycles (labeled) — ``cs_Cycle.c``
    semantics via functions.cstring.canonical_cycle."""
    from ..functions.cstring import canonical_cycle

    adj: dict[int, list] = {v: [] for v in vertices}
    emap: dict[tuple, str] = {}
    for a, b, el in edges:
        if a == b:
            continue
        adj[a].append(b)
        adj[b].append(a)
        emap[(min(a, b), max(a, b))] = el
    out: set[str] = set()
    verts = sorted(vertices)

    def walk(start, path, onpath):
        v = path[-1]
        for w in sorted(adj[v]):
            if w == start and len(path) >= 3:
                vl = [vertices[x] for x in path]
                el = [
                    emap[(min(path[i], path[(i + 1) % len(path)]),
                          max(path[i], path[(i + 1) % len(path)]))]
                    for i in range(len(path))
                ]
                out.add(canonical_cycle(vl, el))
                continue
            if w > start and w not in onpath:
                path.append(w)
                onpath.add(w)
                walk(start, path, onpath)
                path.pop()
                onpath.discard(w)

    for s in verts:
        walk(s, [s], {s})
    return out


def _bridge_tree_features(vertices: dict, edges: list) -> set[str]:
    """Canonical strings of the bridge-forest trees (cpk's tree half:
    delete every edge inside a biconnected block, keep bridges; each
    resulting tree component with ≥1 edge is a feature)."""
    from ..functions.cstring import canonical_tree_string
    from ..graph.gdb import _bridges_and_blocks

    verts = sorted(vertices)
    idx = {v: i for i, v in enumerate(verts)}
    adj: list[list[int]] = [[] for _ in verts]
    emap: dict[tuple, str] = {}
    for a, b, el in edges:
        if a == b:
            continue
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
        emap[(min(a, b), max(a, b))] = el
    _, _, bridge_edges, _, _, _ = _bridges_and_blocks(len(verts), adj)
    # components of the bridge forest
    badj: dict[int, list] = {}
    for i, j in bridge_edges:
        a, b = verts[i], verts[j]
        badj.setdefault(a, []).append(b)
        badj.setdefault(b, []).append(a)
    out: set[str] = set()
    seen: set = set()
    for s in sorted(badj):
        if s in seen:
            continue
        comp = [s]
        seen.add(s)
        stack = [s]
        while stack:
            v = stack.pop()
            for w in badj[v]:
                if w not in seen:
                    seen.add(w)
                    comp.append(w)
                    stack.append(w)
        cset = set(comp)
        tedges = [
            (a, b, emap[(min(a, b), max(a, b))])
            for a in cset
            for b in badj[a]
            if a < b
        ]
        c = canonical_tree_string({v: vertices[v] for v in cset}, tedges)
        if c is not None:
            out.add(c)
    return out


def _simple_labeled_edges(edges: list) -> list:
    """Canonicalize a derived edge list to the SIMPLE labeled graph the cpk
    semantics are defined over (cpk.c operates on simple labeled graphs):
    one undirected edge per vertex pair, label = MIN over the labels of all
    directed/duplicate rows for that pair, self-loops dropped. Makes the
    feature map independent of row order (the raw derivation can emit both
    directions of a pair, or the same pair under two labels) — and therefore
    SQL-twinnable."""
    best: dict[tuple, str] = {}
    for a, b, el in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        if k not in best or el < best[k]:
            best[k] = el
    return [(a, b, el) for (a, b), el in sorted(best.items())]


def cyclic_pattern_features(sf_dir: str) -> rd.Dataset:
    """cpk feature map over the per-order graph DB: (graph_id, kind, feature)
    rows, kind ∈ {cycle, tree}, computed over the SIMPLE min-label graph
    (``_simple_labeled_edges``). Deterministic; sorted within graph;
    SQL-oracled (per-order graphs are line-count-bounded, so the twin
    enumerates cycle edge-subsets and unrolls the bridge-forest encoding)."""
    edges = order_graph_edges_full(sf_dir)

    def per_graph(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        gids, kinds, feats = [], [], []
        for gid, g in df.groupby("graph_id", sort=False):
            vertices, gedges = _graph_structs(g)
            gedges = _simple_labeled_edges(gedges)
            for f in sorted(_cycle_features(vertices, gedges)):
                gids.append(int(gid))
                kinds.append("cycle")
                feats.append(f)
            for f in sorted(_bridge_tree_features(vertices, gedges)):
                gids.append(int(gid))
                kinds.append("tree")
                feats.append(f)
        return pa.table(
            {
                "graph_id": pa.array(gids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "feature": pa.array(feats, pa.string()),
            }
        )

    return bucketed_group_combine(edges, ["graph_id"], per_graph)


def tree_pattern_features(
    sf_dir: str, max_edges: int = 2, min_support: int = 3
) -> rd.Dataset:
    """tpk shape: mine frequent trees, then probe every graph against them
    (sparse binary feature table, the input of the libSVM sink)."""
    from .levelwise import levelwise_tree_mining

    frequent = levelwise_tree_mining(
        sf_dir, max_edges=max_edges, min_support=min_support
    )
    patterns = frequent["pattern"].tolist()
    return pattern_feature_table(order_graph_edges_full(sf_dir), patterns)


def pattern_gram(features: rd.Dataset, sample_ids: list[int]) -> pd.DataFrame:
    """Intersection kernel over a small graph sample: K[i][j] = number of
    shared features (what the cpk/tpk executables print). The sample side is
    broadcast; the feature table streams through ONE filtered pass + a
    pandas self-merge of the (tiny) sample slice."""
    ids = sorted(set(int(x) for x in sample_ids))
    id_ref = ray.put(set(ids))

    def keep(t: pa.Table) -> pa.Table:
        want = ray.get(id_ref)
        m = np.fromiter(
            (int(g) in want for g in t["graph_id"].to_numpy()),
            bool,
            count=t.num_rows,
        )
        return t.filter(pa.array(m))

    slice_df = features.map_batches(keep, batch_format="pyarrow").to_pandas()
    key = (
        slice_df["kind"] + "|" + slice_df["feature"]
        if "kind" in slice_df.columns
        else slice_df["pattern"]
    )
    slice_df = pd.DataFrame({"graph_id": slice_df["graph_id"], "key": key})
    j = slice_df.merge(slice_df, on="key")
    gram = (
        j.groupby(["graph_id_x", "graph_id_y"]).size().unstack(fill_value=0)
    )
    gram = gram.reindex(index=ids, columns=ids, fill_value=0)
    return gram


def cactus_pattern_features(long_ds, patterns: list[str]) -> "pd.DataFrame":
    """Tree-pattern boolean feature map over a CACTUS graph DB via the
    cactus-structured DP (``algos.cactus_iso.tree_in_cactus`` — reference
    ``cactustree.c`` cactusTreeSubIso, driver ``executables/cactus.c``):
    -> DataFrame (graph_id, pattern, matched). ``long_ds`` is the long-row
    GDB form (kind 'v'/'e'; e.g. ``sources.generators.block_chain_db`` with
    ``diagonal_prob=0``). Patterns (canonical tree strings) broadcast once;
    the DB streams through one bucketed exchange keyed on graph_id; hosts
    that are not cacti fall back to the general backtracking operator (the
    two agree wherever both are defined — pytest-pinned)."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from ..algos.cactus_iso import tree_in_cactus
    from ..algos.subtree_iso import tree_in_graph
    from ..functions.bucketing import bucketed_group_combine
    from ..functions.cstring import parse_cstring

    parsed = [(p, *parse_cstring(p)) for p in sorted(set(patterns))]
    pat_ref = ray.put(parsed)

    def per_bucket(t: pa.Table) -> pa.Table:
        pats = ray.get(pat_ref)
        df = t.to_pandas()
        gids, pstrs, matched = [], [], []
        for gid, g in df.groupby("graph_id", sort=True):
            vertices = {
                int(r.a): "x" for r in g.itertuples() if r.kind == "v"
            }
            gedges = [
                (int(r.a), int(r.b), "x")
                for r in g.itertuples()
                if r.kind == "e"
            ]
            for pstr, pv, pe in pats:
                try:
                    m = tree_in_cactus(pv, pe, vertices, gedges)
                except ValueError:
                    m = tree_in_graph(pv, pe, vertices, gedges)
                gids.append(int(gid))
                pstrs.append(pstr)
                matched.append(bool(m))
        return pa.table(
            {
                "graph_id": pa.array(gids, pa.int64()),
                "pattern": pa.array(pstrs, pa.string()),
                "matched": pa.array(matched, pa.bool_()),
            }
        )

    out = bucketed_group_combine(long_ds, ["graph_id"], per_bucket).to_pandas()
    return out.sort_values(["graph_id", "pattern"]).reset_index(drop=True)
