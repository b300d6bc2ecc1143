"""Deterministic hashing primitives (SURVEY.md §2.8).

The reference assigns ids by trie insertion order (``searchTree.c:504``) — a
serial artifact we must not copy. All ids here are content hashes: stable
across runs, processes, partition counts and ``num_cpus`` (never Python's
salted ``hash()``).

``sha256_hex`` implements the per-row ingest invariant required by
BASELINE.json (oracle: ``hashlib.sha256(content.encode()).hexdigest()``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_hex(strings) -> pa.Array:
    """sha256 hex digest per string. Accepts a pyarrow Array/ChunkedArray or
    any iterable of str; returns a pyarrow string array (null -> null).

    hashlib releases the GIL per call and is C-speed; there is no vectorized
    sha256 in numpy/pyarrow, so a tight Python loop is the practical floor.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        strings = strings.to_pylist()
    out = [
        None if s is None else hashlib.sha256(s.encode("utf-8")).hexdigest()
        for s in strings
    ]
    return pa.array(out, type=pa.string())


def md5_hex(strings) -> pa.Array:
    """md5 hex digest per string — matches DuckDB's ``md5()`` so engine-side
    signatures (WL relabel, exact dedup keys) can be verified in SQL."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        strings = strings.to_pylist()
    out = [
        None if s is None else hashlib.md5(s.encode("utf-8")).hexdigest()
        for s in strings
    ]
    return pa.array(out, type=pa.string())


def stable_id64(strings) -> np.ndarray:
    """Stable non-negative int64 id per string via blake2b(digest_size=8).

    Used for vertex ids (``repo:path`` -> int64, FIXTURES.md §2). Collision
    probability over n keys ~ n^2 / 2^64 — negligible below ~10^9 vertices;
    ingest still collision-checks the dictionary (graph/build.py).
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        strings = strings.to_pylist()
    out = np.empty(len(strings), dtype=np.int64)
    for i, s in enumerate(strings):
        d = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
        # mask the sign bit: non-negative ids simplify packing/bucketing
        out[i] = int.from_bytes(d, "little") & 0x7FFF_FFFF_FFFF_FFFF
    return out
