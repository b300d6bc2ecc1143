"""Neighborhood generator — engine analog of the reference's ``ngen``
(``/root/reference/executables/neighborhoodGenerator.c``, help
``neighborhoodGeneratorHelp.txt``): for each vertex v of a graph, emit the
induced subgraph on the closed 1-neighborhood N[v] = {v} ∪ N(v) as its own
graph (graph id = ego vertex id).

Distributed shape: membership table N[·] broadcast (small thresholded
subgraphs) or bucketed-joined at scale; each edge (a,b) of the simple graph
belongs to ego g's subgraph iff a ∈ N[g] and b ∈ N[g] — i.e. the egonet edge
list is exactly { (g, a, b) : g ∈ N[a] ∩ N[b] } — a common-neighbor
expansion evaluated vectorized per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..algos.triangles import simple_undirected


def egonet_edges(edges: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """-> (ego: int64, src: int64, dst: int64): the edge lists of every
    closed-1-neighborhood induced subgraph of the simple graph."""
    simple = simple_undirected(edges, num_buckets=num_buckets).materialize()

    # closed-neighborhood sets, broadcast (driver-held adjacency; the scale
    # path is a double bucketed join on src/dst membership — see docstring)
    adj: dict[int, set] = {}
    for b in simple.iter_batches(batch_size=None, batch_format="pyarrow"):
        for u, v in zip(b["src"].to_numpy(), b["dst"].to_numpy()):
            adj.setdefault(int(u), {int(u)}).add(int(v))
            adj.setdefault(int(v), {int(v)}).add(int(u))
    adj_ref = ray.put(adj)

    def expand(t: pa.Table) -> pa.Table:
        _adj = ray.get(adj_ref)
        egos, srcs, dsts = [], [], []
        for a, b_ in zip(t["src"].to_numpy(), t["dst"].to_numpy()):
            common = _adj[int(a)] & _adj[int(b_)]
            for g in common:
                egos.append(g)
                srcs.append(a)
                dsts.append(b_)
        return pa.table(
            {
                "ego": np.asarray(egos, np.int64),
                "src": np.asarray(srcs, np.int64),
                "dst": np.asarray(dsts, np.int64),
            }
        )

    return simple.map_batches(expand, batch_format="pyarrow")
