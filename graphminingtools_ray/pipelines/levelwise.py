"""Levelwise frequent PATH-pattern mining — the engine's end-to-end analog
of the reference's ``lwg`` BFS mining loop (``/root/reference/
lwm_miningAndExtension.c:255-314`` BFSStrategy; candidate generation +
apriori check ``treeEnumeration.c:157-287``; per-level flushed output
``:283-286``).

Pattern class: labeled simple paths (the reference's patterns are trees;
paths are the tree subclass whose candidate generation is closed — every
(k)-edge path extends a (k-1)-edge path — which keeps the apriori loop exact
without a full subtree-iso operator; general trees are the round-2
extension point via the same loop).

Canonical path identity: serialize vertex/edge labels along the path in
both directions, keep the lexicographic minimum — unique up to path
reversal (the path analog of the cstring canonical form).

Per level k:
  1. candidates: frequent (k-1)-paths extended by frequent edge triples
     (apriori: every sub-path of a candidate must be frequent — checked
     against the previous level's pattern set);
  2. support: per graph, enumerate distinct simple paths of length k whose
     canonical string is a candidate → hash-bucketed count per pattern;
  3. HAVING support >= threshold; emit level output (natural checkpoint
     boundary, like the reference's per-level flush).

Everything per-graph runs inside ONE bucketed exchange keyed on graph_id;
candidate sets broadcast via ``ray.put`` (small side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.bucketing import bucketed_group_combine
from .mining import _n_graphs, order_graph_edges_full


def canonical_path(vlabels: list[str], elabels: list[str]) -> str:
    """Canonical string of a labeled path: vertex/edge labels interleaved,
    min over the two directions."""
    fwd = vlabels[0]
    for el, vl in zip(elabels, vlabels[1:]):
        fwd += f"-{el}-{vl}"
    rl = list(reversed(vlabels))
    re_ = list(reversed(elabels))
    bwd = rl[0]
    for el, vl in zip(re_, rl[1:]):
        bwd += f"-{el}-{vl}"
    return min(fwd, bwd)


def _paths_of_graph(edges_df: pd.DataFrame, max_len: int) -> dict[int, set]:
    """All distinct canonical simple-path patterns of length 1..max_len in
    one small graph. edges_df columns: va, vb, ba, bb, le."""
    adj: dict[int, list] = {}
    brand: dict[int, str] = {}
    for r in edges_df.itertuples():
        adj.setdefault(r.va, []).append((r.vb, r.le))
        adj.setdefault(r.vb, []).append((r.va, r.le))
        brand[r.va] = r.ba
        brand[r.vb] = r.bb
    out: dict[int, set] = {k: set() for k in range(1, max_len + 1)}

    def walk(path_v: list[int], vlab: list[str], elab: list[str]):
        k = len(elab)
        if k >= 1:
            out[k].add(canonical_path(vlab, elab))
        if k == max_len:
            return
        for w, el in adj.get(path_v[-1], ()):
            if w in path_v:
                continue  # simple paths only
            walk(path_v + [w], vlab + [brand[w]], elab + [el])

    for v in adj:
        walk([v], [brand[v]], [])
    return out


def levelwise_path_mining(
    sf_dir: str,
    max_len: int = 3,
    min_support_frac: float = 0.002,
):
    """-> DataFrame (level, pattern, support), frequent only, all levels.

    BFS loop with apriori pruning between levels: level-k support counting
    only considers patterns whose two (k-1)-sub-paths were frequent at the
    previous level (``aprioriCheckExtensionReturnList`` semantics)."""
    threshold = int(np.floor(min_support_frac * _n_graphs(sf_dir)))
    edges = order_graph_edges_full(sf_dir).materialize()

    frequent_prev: set | None = None  # None → level 1 (no pruning)
    results = []
    for level in range(1, max_len + 1):
        prev_ref = ray.put(frequent_prev)

        def count_level(t: pa.Table, _level=level, _prev=prev_ref) -> pa.Table:
            prev = ray.get(_prev)
            df = t.to_pandas()
            counts: dict[str, int] = {}
            for _, g in df.groupby("graph_id", sort=False):
                pats = _paths_of_graph(g, _level)[_level]
                if prev is not None:
                    pats = {p for p in pats if _subpaths_frequent(p, prev)}
                for p in pats:
                    counts[p] = counts.get(p, 0) + 1
            return pa.table(
                {
                    "pattern": pa.array(list(counts), pa.string()),
                    "partial": pa.array(list(counts.values()), pa.int64()),
                }
            )

        def final_sum(t: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {"pattern": t["pattern"].to_pylist(),
                 "partial": t["partial"].to_numpy()}
            )
            g = df.groupby("pattern", sort=True)["partial"].sum()
            return pa.table(
                {
                    "pattern": pa.array(g.index.tolist(), pa.string()),
                    "support": g.to_numpy(np.int64),
                }
            )

        counted = bucketed_group_combine(
            bucketed_group_combine(edges, ["graph_id"], count_level),
            ["pattern"],
            final_sum,
        ).to_pandas()
        counted = counted[counted["support"] >= threshold]
        counted = counted.sort_values("pattern").reset_index(drop=True)
        frequent_prev = set(counted["pattern"])
        counted.insert(0, "level", level)
        results.append(counted)
        if len(counted) == 0:
            break  # no frequent patterns can extend further

    return pd.concat(results, ignore_index=True)


# ---------------------------------------------------------------------------
# general-TREE levelwise mining (round 2 — the reference's flagship `lwg`)
# ---------------------------------------------------------------------------

def _tree_extensions(
    pattern: str, by_label: dict[str, list[tuple[str, str]]]
) -> set[str]:
    """All canonical (k+1)-edge trees obtained by attaching one frequent
    edge triple as a new leaf at any vertex of ``pattern``
    (``/root/reference/treeEnumeration.c:157-287``
    ``extendPatternByLargerEdgesTMP`` semantics: extend at every vertex,
    canonicalize, dedupe). ``by_label[l]`` = [(edge_label, other_label)] of
    frequent triples touching vertex label ``l`` (label-indexed so only
    admissible triples are tried)."""
    from ..functions.cstring import canonical_tree_string, parse_cstring

    vertices, edges = parse_cstring(pattern)
    out = set()
    for u, ul in vertices.items():
        for le, there in by_label.get(ul, ()):
            nid = len(vertices)
            v2 = dict(vertices)
            v2[nid] = there
            c = canonical_tree_string(v2, edges + [(u, nid, le)])
            if c is not None:
                out.add(c)
    return out


@ray.remote
def _extend_slice(
    patterns: list[str],
    by_label: dict[str, list[tuple[str, str]]],
    frequent_prev: set[str],
) -> dict:
    """Candidate generation fan-out task: extend a slice of the frequent
    set, apriori-filter (every leaf-removal subtree frequent), and return
    candidates PRE-PARSED with their edge-triple multisets so the driver
    never re-parses: {canonical: (pv, pe, need_triples, anchor)}."""
    from collections import Counter

    from ..functions.cstring import parse_cstring

    out = {}
    for p in patterns:
        for c in _tree_extensions(p, by_label):
            if c in out:
                continue
            if all(s in frequent_prev for s in _leaf_removals(c)):
                pv, pe = parse_cstring(c)
                trips = sorted(
                    (min(pv[a], pv[b]), el, max(pv[a], pv[b]))
                    for a, b, el in pe
                )
                out[c] = (pv, pe, Counter(trips), trips[0])
    return out


def _leaf_removals(pattern: str) -> list[str]:
    """Canonical strings of every (k-1)-edge subtree obtained by removing
    one leaf — the apriori subpattern set
    (``treeEnumeration.c:226`` ``aprioriCheckExtensionReturnList``)."""
    from ..functions.cstring import canonical_tree_string, parse_cstring

    vertices, edges = parse_cstring(pattern)
    deg: dict[int, int] = {v: 0 for v in vertices}
    for a, b, _ in edges:
        deg[a] += 1
        deg[b] += 1
    out = set()
    for leaf in [v for v, d in deg.items() if d == 1]:
        v2 = {v: l for v, l in vertices.items() if v != leaf}
        e2 = [e for e in edges if leaf not in (e[0], e[1])]
        c = canonical_tree_string(v2, e2)
        if c is not None:
            out.add(c)
    return sorted(out)


def levelwise_tree_mining(
    sf_dir: str,
    max_edges: int = 3,
    min_support: int = 3,
    embedding_operator: str = "subtree",
    operator_threshold: float = 0,
):
    """-> DataFrame (level, pattern, support): frequent labeled TREES of the
    per-order graph DB, level = edge count, pattern = reference-format
    canonical tree string (functions.cstring).

    ``embedding_operator`` selects the support predicate like the
    reference's ``lwg -e`` registry (levelwiseGraphMiningMain.c:102-261):
    "subtree" (exact, default), "global_tree_enumeration"
    (exactGlobalTreeEnumeration — equal to exact subtree iso by the
    spanning-tree-closure argument), "ps" (probabilistic tree sampling:
    forest-of-k-sampled-spanning-trees transactions), "local_easy" (exact
    SpanningtreeTree), "local_easy_sampled" (bps),
    "local_easy_resampled" (bps_resampling — fresh trees per evaluation),
    "hops"/"hops_simple" (FK sampling estimate), "hops_matching" (FKM/FKF
    matching-based estimate), "tree_enumeration" (alwaysReturnTrue — pure
    enumeration), "abs_importance"/"rel_importance" (importantSubtrees.c);
    ``operator_threshold`` parameterizes the non-default operators (k for
    the sampling operators, t for importance). The sampled operators are
    one-sided: reported supports are lower bounds of the exact ones.

    The reference's BFS mining loop (``lwm_miningAndExtension.c:255-314``)
    re-expressed: per level, candidate trees are generated driver-side from
    the previous level's frequent set (pattern-scale — the reference also
    holds the candidate search tree in memory) and broadcast; support
    counting is ONE bucketed exchange keyed on graph_id with the exact
    embedding test (``algos.subtree_iso.tree_in_graph`` — backtracking,
    since per-order transactions are arbitrary small graphs; the rooted-DP
    ``subtree_iso_trees`` operator is the tree-transaction fast path) run
    per (graph, candidate) inside the bucket; a second small exchange sums
    per-pattern support. Per-level output is the natural checkpoint
    boundary, like the reference's per-level flush.
    """
    from collections import Counter

    from ..functions.cstring import canonical_tree_string, parse_cstring
    from .poset_minhash import make_match_op

    threshold = int(min_support)
    edges = order_graph_edges_full(sf_dir).materialize()

    results = []
    frequent_prev: list[str] = []
    by_label: dict[str, list[tuple[str, str]]] = {}
    for level in range(1, max_edges + 1):
        if level == 1:
            candidates = None  # level 1: count all single-edge trees
        else:
            # candidate generation fans out over the frequent set (Ray
            # tasks, ~64 patterns per slice); apriori filter inside the task
            prev_set = set(frequent_prev)
            futures = [
                _extend_slice.remote(frequent_prev[i: i + 64], by_label, prev_set)
                for i in range(0, len(frequent_prev), 64)
            ]
            cand_map: dict = {}
            for s in ray.get(futures):
                cand_map.update(s)
            if not cand_map:
                break
            candidates = cand_map
        if candidates is None:
            cand_ref = ray.put(None)
        else:
            # candidates are indexed by their ANCHOR (lexicographic min edge
            # triple) so a graph only tests candidates whose anchor triple it
            # actually contains — the pattern-poset pruning idea of the
            # reference's search tree. All parsing happened in the fan-out.
            by_anchor: dict[tuple, list] = {}
            for c, (pv, pe, need, anchor) in candidates.items():
                by_anchor.setdefault(anchor, []).append((c, pv, pe, need))
            cand_ref = ray.put(by_anchor)

        def count_level(t: pa.Table, _cand=cand_ref,
                        _op=embedding_operator,
                        _ot=operator_threshold) -> pa.Table:
            by_anchor = ray.get(_cand)
            match_op = make_match_op(_op, _ot)
            df = t.to_pandas()
            counts: dict[str, int] = {}
            for _, g in df.groupby("graph_id", sort=False):
                vertices: dict[int, str] = {}
                gedges = []
                for r in g.itertuples():
                    vertices[int(r.va)] = r.ba
                    vertices[int(r.vb)] = r.bb
                    gedges.append((int(r.va), int(r.vb), r.le))
                if by_anchor is None:
                    # level 1: distinct single-edge canonical trees
                    pats = {
                        canonical_tree_string(
                            {0: vertices[a], 1: vertices[b]}, [(0, 1, el)]
                        )
                        for a, b, el in gedges
                    }
                else:
                    gtrips = Counter(
                        (min(vertices[a], vertices[b]), el,
                         max(vertices[a], vertices[b]))
                        for a, b, el in gedges
                    )
                    pats = set()
                    for anchor in gtrips:
                        for c, pv, pe, need in by_anchor.get(anchor, ()):
                            if c in pats:
                                continue
                            if any(gtrips[k] < n for k, n in need.items()):
                                continue  # edge-triple multiset prune
                            if match_op(pv, pe, vertices, gedges):
                                pats.add(c)
                for p in pats:
                    counts[p] = counts.get(p, 0) + 1
            return pa.table(
                {
                    "pattern": pa.array(list(counts), pa.string()),
                    "partial": pa.array(list(counts.values()), pa.int64()),
                }
            )

        def final_sum(t: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {"pattern": t["pattern"].to_pylist(),
                 "partial": t["partial"].to_numpy()}
            )
            g = df.groupby("pattern", sort=True)["partial"].sum()
            return pa.table(
                {
                    "pattern": pa.array(g.index.tolist(), pa.string()),
                    "support": g.to_numpy(np.int64),
                }
            )

        counted = bucketed_group_combine(
            bucketed_group_combine(edges, ["graph_id"], count_level),
            ["pattern"],
            final_sum,
        ).to_pandas()
        counted = counted[counted["support"] >= threshold]
        counted = counted.sort_values("pattern").reset_index(drop=True)
        frequent_prev = counted["pattern"].tolist()
        if level == 1:
            by_label = {}
            for p in frequent_prev:
                pv, pe = parse_cstring(p)
                (a, b, el) = pe[0]
                la, lb = pv[a], pv[b]
                by_label.setdefault(la, []).append((el, lb))
                if lb != la:
                    by_label.setdefault(lb, []).append((el, la))
        counted.insert(0, "level", level)
        results.append(counted)
        if len(counted) == 0:
            break

    return pd.concat(results, ignore_index=True)


def _subpaths_frequent(pattern: str, prev: set) -> bool:
    """Apriori: both (k-1)-sub-paths of a canonical k-path must be frequent.
    A canonical path string 'v-e-v-...-v' drops one end (2 tokens) per side.
    (Labels must not contain '-'; true for the brand/returnflag alphabet.)"""
    toks = pattern.split("-")
    return (
        _canon_tokens(toks[:-2]) in prev and _canon_tokens(toks[2:]) in prev
    )


def _canon_tokens(toks: list[str]) -> str:
    fwd = "-".join(toks)
    bwd = "-".join(reversed(toks))
    return min(fwd, bwd)


# ---------------------------------------------------------------------------
# ROOTED levelwise mining (round 3 — the reference's `lwgr` executable family)
# ---------------------------------------------------------------------------

def _rooted_leaf_removals(pattern: str) -> list[str]:
    """Rooted apriori parents: canonical strings of every (k-1)-edge rooted
    subtree obtained by deleting one degree-1 vertex
    (``treeEnumerationRooted.c:56-119`` aprioriCheckExtensionRootedReturnList
    removes every leaf). Deleting a childless leaf keeps the root; deleting
    the ROOT (legal when it has exactly one child) re-roots at that child —
    sound because a rooted occurrence of the candidate restricted to the
    child's subtree is a rooted occurrence of the parent pattern."""
    from ..functions.cstring import canonical_rooted_tree_string, parse_cstring

    vertices, edges = parse_cstring(pattern)
    children: dict[int, list] = {v: [] for v in vertices}
    for p, c, _ in edges:
        children[p].append(c)
    out = set()
    for leaf in [v for v in vertices if not children[v] and v != 0]:
        v2 = {v: l for v, l in vertices.items() if v != leaf}
        e2 = [e for e in edges if e[1] != leaf]
        c = canonical_rooted_tree_string(v2, e2)
        if c is not None:
            out.add(c)
    if len(children[0]) == 1 and len(vertices) > 1:
        v2 = {v: l for v, l in vertices.items() if v != 0}
        e2 = [e for e in edges if e[0] != 0]
        c = canonical_rooted_tree_string(v2, e2)
        if c is not None:
            out.add(c)
    return sorted(out)


def _rooted_extensions(
    pattern: str, by_parent: dict[str, list[tuple[str, str]]]
) -> set[str]:
    """All canonical (k+1)-edge rooted trees obtained by attaching one
    frequent DIRECTED edge as a new child at any vertex whose label matches
    the edge's parent label (``treeEnumerationRooted.c:26-40``
    extendRootedPatternAllWays: startPoint label selects the attach vertex,
    endPoint label is the new child's label)."""
    from ..functions.cstring import canonical_rooted_tree_string, parse_cstring

    vertices, edges = parse_cstring(pattern)
    out = set()
    for u, ul in vertices.items():
        for el, child_label in by_parent.get(ul, ()):
            nid = len(vertices)
            v2 = dict(vertices)
            v2[nid] = child_label
            c = canonical_rooted_tree_string(v2, edges + [(u, nid, el)])
            if c is not None:
                out.add(c)
    return out


@ray.remote
def _extend_slice_rooted(
    patterns: list[str],
    by_parent: dict[str, list[tuple[str, str]]],
    frequent_prev: set[str],
) -> dict:
    """Rooted candidate-generation fan-out: extend a slice of the frequent
    set, apriori-filter, return {canonical: (pv, pe, need_triples, anchor)}
    with DIRECTED (parent_label, edge_label, child_label) triples."""
    from collections import Counter

    from ..functions.cstring import parse_cstring

    out = {}
    for p in patterns:
        for c in _rooted_extensions(p, by_parent):
            if c in out:
                continue
            if all(s in frequent_prev for s in _rooted_leaf_removals(c)):
                pv, pe = parse_cstring(c)
                trips = sorted((pv[a], el, pv[b]) for a, b, el in pe)
                out[c] = (pv, pe, Counter(trips), trips[0])
    return out


def levelwise_rooted_mining(
    sf_dir: str,
    max_edges: int = 3,
    min_support: int = 3,
):
    """-> DataFrame (level, pattern, support): frequent ROOTED labeled trees
    of the per-order DIRECTED graph DB (edge = consecutive line numbers,
    oriented earlier -> later), level = VERTEX count (level 1 = single
    vertices, level k = (k-1)-edge rooted trees, mined up to
    ``max_edges``-edge patterns), pattern = canonical rooted tree string.

    The reference's `lwgr` BFS loop re-expressed
    (``lwmr_miningAndExtension.c``; init
    ``lwmr_initAndCollect.c:213-256`` initDirectedPatternEnumeration):
    transactions load as DIRECTED graphs, level-1 patterns are frequent
    vertex labels, the extension set is the frequent DIRECTED edges
    (``getFrequentDirectedEdges``, counted once — support of a 2-vertex
    rooted pattern IS its directed-triple support, so level 2 is emitted
    from that same count), candidates extend by attaching a frequent
    directed edge as a new child (``extendRootedPatternAllWays``) with the
    rooted apriori check, and support counting runs the rooted embedding
    operator (``algos.subtree_iso.rooted_tree_in_digraph`` — the engine's
    exact counterpart of rootedSubtreeComputationOperator) inside ONE
    bucketed exchange keyed on graph_id.
    """
    from collections import Counter

    from ..algos.subtree_iso import rooted_tree_in_digraph
    from ..functions.cstring import canonical_rooted_tree_string

    threshold = int(min_support)
    edges = order_graph_edges_full(sf_dir).materialize()

    def final_sum(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"pattern": t["pattern"].to_pylist(),
             "partial": t["partial"].to_numpy()}
        )
        g = df.groupby("pattern", sort=True)["partial"].sum()
        return pa.table(
            {
                "pattern": pa.array(g.index.tolist(), pa.string()),
                "support": g.to_numpy(np.int64),
            }
        )

    # level 1 (frequent vertices) + the directed-edge extension set in one
    # pass each: per graph, distinct vertex labels / distinct directed
    # (parent_label, edge_label, child_label) triples
    def count_vertices(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        counts: dict[str, int] = {}
        for _, g in df.groupby("graph_id", sort=False):
            for lab in set(g["ba"]).union(g["bb"]):
                p = f"{lab} "
                counts[p] = counts.get(p, 0) + 1
        return pa.table(
            {
                "pattern": pa.array(list(counts), pa.string()),
                "partial": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def count_directed_edges(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        counts: dict[str, int] = {}
        for _, g in df.groupby("graph_id", sort=False):
            trips = {
                canonical_rooted_tree_string(
                    {0: ba, 1: bb}, [(0, 1, le)]
                )
                for ba, bb, le in zip(g["ba"], g["bb"], g["le"])
            }
            for p in trips:
                counts[p] = counts.get(p, 0) + 1
        return pa.table(
            {
                "pattern": pa.array(list(counts), pa.string()),
                "partial": pa.array(list(counts.values()), pa.int64()),
            }
        )

    results = []
    lvl1 = bucketed_group_combine(
        bucketed_group_combine(edges, ["graph_id"], count_vertices),
        ["pattern"], final_sum,
    ).to_pandas()
    lvl1 = lvl1[lvl1["support"] >= threshold].sort_values(
        "pattern"
    ).reset_index(drop=True)
    lvl1.insert(0, "level", 1)
    results.append(lvl1)
    frequent_vertex_labels = {p.strip() for p in lvl1["pattern"]}

    if max_edges >= 1 and len(lvl1):
        lvl2 = bucketed_group_combine(
            bucketed_group_combine(edges, ["graph_id"], count_directed_edges),
            ["pattern"], final_sum,
        ).to_pandas()
        lvl2 = lvl2[lvl2["support"] >= threshold]
        # reference init counts vertices and edges independently; the BFS
        # loop then only extends FREQUENT patterns, so an edge both of whose
        # endpoint labels are frequent is kept (apriori on level 1)
        from ..functions.cstring import parse_cstring as _parse

        keep = []
        by_parent: dict[str, list[tuple[str, str]]] = {}
        for p, s in zip(lvl2["pattern"], lvl2["support"]):
            pv, pe = _parse(p)
            (a, b, el) = pe[0]
            if pv[a] in frequent_vertex_labels and pv[b] in frequent_vertex_labels:
                keep.append((p, s))
                by_parent.setdefault(pv[a], []).append((el, pv[b]))
        lvl2 = pd.DataFrame(keep, columns=["pattern", "support"]).sort_values(
            "pattern"
        ).reset_index(drop=True)
        lvl2.insert(0, "level", 2)
        lvl2["support"] = lvl2["support"].astype(np.int64)
        results.append(lvl2)
        frequent_prev = lvl2["pattern"].tolist()

        for level in range(3, max_edges + 2):
            if not frequent_prev:
                break
            prev_set = set(frequent_prev)
            futures = [
                _extend_slice_rooted.remote(
                    frequent_prev[i: i + 64], by_parent, prev_set
                )
                for i in range(0, len(frequent_prev), 64)
            ]
            cand_map: dict = {}
            for s in ray.get(futures):
                cand_map.update(s)
            if not cand_map:
                break
            by_anchor: dict[tuple, list] = {}
            for c, (pv, pe, need, anchor) in cand_map.items():
                by_anchor.setdefault(anchor, []).append((c, pv, pe, need))
            cand_ref = ray.put(by_anchor)

            def count_level(t: pa.Table, _cand=cand_ref) -> pa.Table:
                by_anchor = ray.get(_cand)
                df = t.to_pandas()
                counts: dict[str, int] = {}
                for _, g in df.groupby("graph_id", sort=False):
                    vertices: dict[int, str] = {}
                    gedges = []
                    for r in g.itertuples():
                        vertices[int(r.va)] = r.ba
                        vertices[int(r.vb)] = r.bb
                        gedges.append((int(r.va), int(r.vb), r.le))
                    gtrips = Counter(
                        (vertices[a], el, vertices[b]) for a, b, el in gedges
                    )
                    pats = set()
                    for anchor in gtrips:
                        for c, pv, pe, need in by_anchor.get(anchor, ()):
                            if c in pats:
                                continue
                            if any(gtrips[k] < n for k, n in need.items()):
                                continue  # directed-triple multiset prune
                            if rooted_tree_in_digraph(pv, pe, vertices, gedges):
                                pats.add(c)
                    for p in pats:
                        counts[p] = counts.get(p, 0) + 1
                return pa.table(
                    {
                        "pattern": pa.array(list(counts), pa.string()),
                        "partial": pa.array(list(counts.values()), pa.int64()),
                    }
                )

            counted = bucketed_group_combine(
                bucketed_group_combine(edges, ["graph_id"], count_level),
                ["pattern"], final_sum,
            ).to_pandas()
            counted = counted[counted["support"] >= threshold]
            counted = counted.sort_values("pattern").reset_index(drop=True)
            frequent_prev = counted["pattern"].tolist()
            counted.insert(0, "level", level)  # level = vertex count
            results.append(counted)
            if len(counted) == 0:
                break

    out = pd.concat(results, ignore_index=True)
    return out
