"""Docking-bits bloom filter — engine analog of the reference's per-graph
pruning bitsets (``/root/reference/bloomFilter.c:8-50``: ``hashID(id) =
1 << (id % bits)``, per-graph ``pruning[index] |= hashID``, candidate prune
``isSubset(fingerprint, index)``).

The reference keeps one global C array indexed by graph position; the
distributed analog is a per-graph uint64 docking-bits COLUMN computed
vectorized inside the same bucketed exchange that probes patterns. A
candidate pattern's fingerprint is the OR of its element hashes; a graph can
only contain the pattern if its bits are a superset — a constant-time
pre-filter in front of the exponential embedding operator, with the same
one-sided-error contract as the reference (never prunes a true embedding).

64 docking bits (vs the reference's ``sizeof(int)*8 = 32``): the modulus is
part of the hash family, not the semantics.
"""

from __future__ import annotations

import numpy as np

_BITS = np.uint64(64)
_ONE = np.uint64(1)


def hash_id(element_ids: np.ndarray) -> np.ndarray:
    """uint64 one-hot hash of int element ids (bloomFilter.c:23-25)."""
    return _ONE << (element_ids.astype(np.uint64) % _BITS)


def docking_bits(
    group_ids: np.ndarray, element_ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-group OR of element hashes, vectorized: sorted-segment reduce.
    Returns (unique_group_ids, bits) with groups ascending."""
    if len(group_ids) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = hash_id(element_ids)
    order = np.argsort(group_ids, kind="stable")
    g, hv = group_ids[order], h[order]
    starts = np.flatnonzero(np.concatenate([[True], g[1:] != g[:-1]]))
    bits = np.bitwise_or.reduceat(hv, starts)
    return g[starts], bits


def fingerprint(element_ids: np.ndarray) -> int:
    """OR-combined hash of a candidate's element ids (its docking needs)."""
    if len(element_ids) == 0:
        return 0
    return int(np.bitwise_or.reduce(hash_id(np.asarray(element_ids))))


def is_subset(fp: int, bits: np.ndarray) -> np.ndarray:
    """Boolean mask: which graphs' docking bits are a superset of ``fp``
    (bloomFilter.c:54-56). Vectorized over graphs."""
    f = np.uint64(fp)
    return (np.asarray(bits, dtype=np.uint64) & f) == f
