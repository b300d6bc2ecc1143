"""Per-partition CSR-ish adjacency blocks (SURVEY.md §7.1 step 4).

The reference pins adjacency lists per graph in memory
(``/root/reference/graph.h:10-19`` ``Vertex.neighborhood``); our analog is a
Dataset of *adjacency blocks*: one row per edge block, with the index arrays
an iterative algorithm needs precomputed ONCE so each superstep is pure
``np.take`` + ``np.bincount`` over zero-copy Arrow list values:

    srcs          list<int64>  unique sorted source ids of the block
    src_index     list<int32>  per-edge index into ``srcs``
    dst_unique    list<int64>  unique sorted destination ids of the block
    dst_index     list<int32>  per-edge index into ``dst_unique``
    weight        list<double> per-edge weight (all-ones if absent)
    n_edges       int64

Blocks are the unit of parallelism: a superstep maps over this dataset
(stateless tasks — the per-iteration state travels as a broadcast object,
not inside the task), pre-aggregates messages per ``dst_unique`` inside the
block (the combiner half of hub handling: shuffle rows per dst are bounded
by #blocks, not by in-degree), and ships only the partials to the
``groupby(dst)`` exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _block_to_csr(batch: pa.Table) -> pa.Table:
    src = batch["src"].to_numpy()
    dst = batch["dst"].to_numpy()
    if "weight" in batch.column_names:
        w = batch["weight"].to_numpy().astype(np.float64)
    else:
        w = np.ones(len(src), dtype=np.float64)
    srcs, src_index = np.unique(src, return_inverse=True)
    dst_unique, dst_index = np.unique(dst, return_inverse=True)
    return pa.table(
        {
            "srcs": pa.array([srcs], pa.list_(pa.int64())),
            "src_index": pa.array([src_index.astype(np.int32)], pa.list_(pa.int32())),
            "dst_unique": pa.array([dst_unique], pa.list_(pa.int64())),
            "dst_index": pa.array([dst_index.astype(np.int32)], pa.list_(pa.int32())),
            "weight": pa.array([w], pa.list_(pa.float64())),
            "n_edges": pa.array([len(src)], pa.int64()),
        }
    )


def build_csr_blocks(edges: rd.Dataset, target_edges_per_block: int = 1_000_000) -> rd.Dataset:
    """Edges → materialized adjacency-block dataset (built once, iterated many
    times). ``batch_size`` bounds block width so a block × pool concurrency
    fits worker heaps at scale."""
    blocks = edges.map_batches(
        _block_to_csr, batch_format="pyarrow", batch_size=target_edges_per_block
    )
    return blocks.materialize()


def unpack_block(batch: pa.Table, row: int = 0):
    """Zero-copy-ish views of one adjacency-block row as numpy arrays."""
    srcs = batch["srcs"][row].values.to_numpy(zero_copy_only=False)
    src_index = batch["src_index"][row].values.to_numpy(zero_copy_only=False)
    dst_unique = batch["dst_unique"][row].values.to_numpy(zero_copy_only=False)
    dst_index = batch["dst_index"][row].values.to_numpy(zero_copy_only=False)
    weight = batch["weight"][row].values.to_numpy(zero_copy_only=False)
    return srcs, src_index, dst_unique, dst_index, weight
