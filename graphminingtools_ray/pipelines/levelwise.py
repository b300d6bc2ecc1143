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
import ray.data as rd

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
