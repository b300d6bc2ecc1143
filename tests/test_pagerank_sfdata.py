"""End-to-end PageRank on the derived co-purchase graph vs the scipy/numpy
oracle (the allclose-1e-6 correctness gate from BASELINE.md, on real sf
data rather than micro fixtures)."""

import numpy as np

from graphminingtools_ray.algos.pagerank import pagerank
from graphminingtools_ray.graph.build import copurchase_edges, symmetrize

from .oracles import pagerank_oracle

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_copurchase_matches_oracle():
    edges = copurchase_edges(SF_DIR).drop_columns(["weight"])
    pairs = [
        (int(r["src"]), int(r["dst"]))
        for r in edges.take_all()
    ]
    ids, ranks, info = pagerank(symmetrize(edges), tol=1e-10, max_iter=200)
    oids, oranks = pagerank_oracle(pairs, tol=1e-10, max_iter=200, directed=False)
    assert np.array_equal(ids, oids)
    np.testing.assert_allclose(ranks, oranks, atol=1e-6)
    assert info["converged"]
    assert abs(ranks.sum() - 1.0) < 1e-9
