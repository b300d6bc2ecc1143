"""Random graph DB generators — asserts mirroring the reference testsuite
(``/root/reference/tests/testsuite.c:23-65``: vertex counts, edge bounds)
plus determinism across batching/num_cpus (our addition)."""

import numpy as np
import ray.data as rd

from graphminingtools_ray.graph.gdb import graph_measures
from graphminingtools_ray.sources.generators import (
    barabasi_albert_db,
    erdos_renyi_db,
    gdb_from_long,
)


def test_erdos_renyi_shape():
    long_ds = erdos_renyi_db(n_graphs=10, n_vertices=12, edge_prob=0.3, seed=7)
    verts, edges = gdb_from_long(long_ds)
    vp = verts.to_pandas()
    ep = edges.to_pandas()
    assert set(vp["graph_id"]) == set(range(10))
    assert (vp.groupby("graph_id").size() == 12).all()
    # edge bound: at most C(12,2), 1-based endpoints
    assert ep.groupby("graph_id").size().max() <= 66
    assert ep["v"].between(1, 12).all() and ep["w"].between(1, 12).all()
    assert (ep["v"] < ep["w"]).all()


def test_erdos_renyi_deterministic_across_batching():
    a = erdos_renyi_db(5, 10, 0.4, seed=3).to_pandas()
    b = (
        erdos_renyi_db(5, 10, 0.4, seed=3)
        .repartition(5)
        .to_pandas()
    )
    key = ["kind", "graph_id", "a", "b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_barabasi_albert_connected():
    long_ds = barabasi_albert_db(n_graphs=5, n_vertices=20, edges_per_vertex=2, seed=11)
    verts, edges = gdb_from_long(long_ds)
    m = graph_measures(verts, edges).to_pandas()
    assert len(m) == 5
    assert m["connected"].all()  # preferential attachment grows connected
    assert (m["n"] == 20).all()
