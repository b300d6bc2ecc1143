"""Hub-vertex splitting: the 2D-grid substrate must spread a hub's edge
list across the P cells of its src row (by part(dst)) instead of parking
degree-scale state on one partition — the north-star's skew requirement.
A star graph is the worst case: EVERY edge leaves one vertex."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from graphminingtools_ray.algos.partitioned import build_partitioned_graph


def test_star_graph_hub_edges_split_across_cells(ray_session):
    n, P = 20_000, 4
    hub = 7  # arbitrary id; its partition is hash-derived
    dsts = np.arange(n, dtype=np.int64) + 10  # avoid the hub id itself
    dsts = dsts[dsts != hub]
    edges = rd.from_arrow(
        pa.table({"src": np.full(len(dsts), hub, np.int64), "dst": dsts})
    )
    g = build_partitioned_graph(edges, P=P)
    assert g.n_edges == len(dsts)

    per_cell: dict[int, int] = {}
    for t in g.blocks.iter_batches(batch_format="pyarrow", batch_size=None):
        for row in range(t.num_rows):
            cell = int(t["block_id"][row].as_py()) >> 32
            per_cell[cell] = per_cell.get(cell, 0) + len(t["dst_index"][row])
    # all edges share one src partition -> exactly one src row of the grid,
    # but that row's P dst-cells each hold a hash-uniform share
    src_rows = {c // P for c in per_cell}
    assert len(src_rows) == 1
    assert len(per_cell) == P
    counts = np.array(sorted(per_cell.values()))
    assert counts.sum() == len(dsts)
    # hash-uniform balance: no cell more than 1.3x the mean
    assert counts.max() <= 1.3 * counts.mean()
    assert counts.min() >= 0.7 * counts.mean()
