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
):
    """-> DataFrame (level, pattern, support): frequent labeled TREES of the
    per-order graph DB, level = edge count, pattern = reference-format
    canonical tree string (functions.cstring).

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

    from ..algos.subtree_iso import tree_in_graph
    from ..functions.cstring import canonical_tree_string, parse_cstring

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
                            if tree_in_graph(pv, pe, vertices, gedges):
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
