"""Neighborhood generator — engine analog of the reference's ``ngen``
(``/root/reference/executables/neighborhoodGenerator.c``, help
``neighborhoodGeneratorHelp.txt``): for each vertex v of a graph, emit the
induced subgraph on the closed 1-neighborhood N[v] = {v} ∪ N(v) as its own
graph (graph id = ego vertex id).

Round-2 FULLY DISTRIBUTED shape (no driver adjacency dict, no per-edge
Python loop): an edge (a, b) belongs to ego g's subgraph iff g ∈ N[a] ∩ N[b].
For g ∉ {a, b} that is exactly "g is a common neighbor of a and b", i.e. the
wedge (a–g–b) exists — so the membership join is:

    symmetrized simple edges → bucketed exchange keyed on the wedge CENTER →
    vectorized pair expansion (all common-neighbor candidates (a, b, g)) →
    union with the edge list → bucketed SEMI-JOIN keyed on (a, b):
    matched wedge rows emit (ego=g, a, b); every edge row additionally emits
    its two trivial egos (ego=a and ego=b, since a, b ∈ N[a] ∩ N[b]).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..algos.triangles import simple_undirected
from ..functions.bucketing import bucketed_group_combine
from .build import _pairs_from_sorted_key_items

_NO_CAP = np.iinfo(np.int64).max


def egonet_edges(edges: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """-> (ego: int64, src: int64, dst: int64): the edge lists of every
    closed-1-neighborhood induced subgraph of the simple graph."""
    simple = simple_undirected(edges, num_buckets=num_buckets).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return pa.table(
            {
                "center": np.concatenate([s, d]),
                "out": np.concatenate([d, s]),
            }
        )

    def expand(t: pa.Table) -> pa.Table:
        c = t["center"].to_numpy()
        o = t["out"].to_numpy()
        ordr = np.lexsort((o, c))
        a, b, centers = _pairs_from_sorted_key_items(
            c[ordr], o[ordr], _NO_CAP, return_keys=True
        )
        return pa.table(
            {"a": a, "b": b, "ego": centers, "kind": np.zeros(len(a), np.int8)}
        )

    wedges = bucketed_group_combine(
        simple.map_batches(both_dirs, batch_format="pyarrow"),
        ["center"],
        expand,
        num_buckets=num_buckets,
        spread=True,
    )

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": t["src"],
                "b": t["dst"],
                "ego": pa.array(np.zeros(t.num_rows, np.int64)),
                "kind": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    def semi_join(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy()
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        g = t["ego"].to_numpy()
        is_edge = kind == 1
        ea, eb = a[is_edge], b[is_edge]
        wa, wb, wg = a[~is_edge], b[~is_edge], g[~is_edge]
        outs = []
        if len(ea):
            # trivial egos: both endpoints of every edge
            outs.append((np.concatenate([ea, eb]), np.tile(ea, 2), np.tile(eb, 2)))
        if len(ea) and len(wa):
            # bucket-local dense remap → overflow-safe packed membership key
            uniq = np.unique(np.concatenate([ea, eb, wa, wb]))
            nloc = np.int64(len(uniq))
            key_e = np.sort(
                np.searchsorted(uniq, ea) * nloc + np.searchsorted(uniq, eb)
            )
            key_w = np.searchsorted(uniq, wa) * nloc + np.searchsorted(uniq, wb)
            pos = np.minimum(np.searchsorted(key_e, key_w), len(key_e) - 1)
            hit = key_e[pos] == key_w
            outs.append((wg[hit], wa[hit], wb[hit]))
        if not outs:
            return pa.table(
                {"ego": np.empty(0, np.int64), "src": np.empty(0, np.int64),
                 "dst": np.empty(0, np.int64)}
            )
        return pa.table(
            {
                "ego": np.concatenate([o[0] for o in outs]),
                "src": np.concatenate([o[1] for o in outs]),
                "dst": np.concatenate([o[2] for o in outs]),
            }
        )

    probe_input = wedges.union(
        simple.map_batches(edge_rows, batch_format="pyarrow")
    )
    return bucketed_group_combine(
        probe_input, ["a", "b"], semi_join, num_buckets=num_buckets
    )
