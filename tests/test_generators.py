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


# ---------------------------------------------------------------------------
# round-2 cgen generators: block chains, overlap, clustered overlap — and the
# round-2 kernel pack evaluated on the graph classes it exists for
# ---------------------------------------------------------------------------

from graphminingtools_ray.graph.gdb import graph_measures
from graphminingtools_ray.sources.generators import (
    block_chain_db,
    clustered_overlap_db,
    gdb_from_long,
    overlap_db,
)


def test_block_chain_structure_and_kernels():
    n_blocks, bs = 4, 5
    long_ds = block_chain_db(6, n_blocks, bs, diagonal_prob=0.0, seed=7)
    verts, edges = gdb_from_long(long_ds)
    m = graph_measures(verts, edges).to_pandas().sort_values("graph_id")
    assert len(m) == 6
    # diagonal_prob=0 → chain of simple cycles: cactus, outerplanar,
    # exactly n_blocks blocks, n_blocks-1 articulation vertices
    assert m["is_cactus"].all()
    assert m["is_outerplanar"].all()
    assert (m["n_blocks"] == n_blocks).all()
    assert (m["max_blocks_per_component"] == n_blocks).all()
    assert (m["n_articulation_points"] == n_blocks - 1).all()
    assert (m["n"] == n_blocks * bs - n_blocks + 1).all()
    # each block contributes exactly one cycle (of length bs)
    assert (m["n_simple_cycles"] == n_blocks).all()
    assert (m["n_noniso_cycles"] == 1).all()  # all cycles same length
    # spanning trees of a cactus = product of cycle lengths
    assert (m["spanning_trees"] == bs ** n_blocks).all()


def test_block_chain_diagonals_break_cactus():
    long_ds = block_chain_db(4, 3, 6, diagonal_prob=0.9, seed=3)
    verts, edges = gdb_from_long(long_ds)
    m = graph_measures(verts, edges).to_pandas()
    assert not m["is_cactus"].any()  # dense diagonals → non-cycle blocks


def test_overlap_generators_deterministic():
    a = overlap_db(3, 12, 0.3, seed=5).to_pandas().sort_values(
        ["graph_id", "kind", "a", "b"]).reset_index(drop=True)
    b = overlap_db(3, 12, 0.3, seed=5).to_pandas().sort_values(
        ["graph_id", "kind", "a", "b"]).reset_index(drop=True)
    assert a.equals(b)
    c = clustered_overlap_db(2, 12, 0.2, 3, 0.05, seed=5).to_pandas()
    d = clustered_overlap_db(2, 12, 0.2, 3, 0.05, seed=5).to_pandas()
    assert c.sort_values(["graph_id", "kind", "a", "b"]).reset_index(drop=True).equals(
        d.sort_values(["graph_id", "kind", "a", "b"]).reset_index(drop=True))


def test_clustered_overlap_denser_within_clusters():
    """With tight clusters and a radius between the intra- and inter-cluster
    scales, member vertices connect within their cluster."""
    long_ds = clustered_overlap_db(1, 12, 0.15, 3, 0.01, seed=11)
    verts, edges = gdb_from_long(long_ds)
    e = edges.to_pandas()
    per = 4
    intra = ((e["v"] - 1) // per == (e["w"] - 1) // per).sum()
    assert intra >= len(e) * 0.5  # intra-cluster edges dominate
    assert len(e) >= 3 * (per * (per - 1) // 2) * 0.5
