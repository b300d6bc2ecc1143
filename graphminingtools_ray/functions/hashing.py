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


def _hex_digest_array(strings, algo, digest_size: int) -> pa.Array:
    """Shared fast path for per-string hex digests: hash UTF-8 bytes straight
    out of the Arrow data buffer (memoryview slices — no Python str
    round-trip), land all digests in ONE buffer, hexlify it with a single C
    call and assemble the output string array from raw buffers (fixed-width
    offsets) — no per-row Python objects anywhere. Nulls fall back to the
    per-row path (rare: hashed columns are content/signature columns)."""
    import binascii

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(list(strings), type=pa.string())
    if strings.null_count:
        out = [
            None if s is None else algo(s.encode("utf-8")).hexdigest()
            for s in strings.to_pylist()
        ]
        return pa.array(out, type=pa.string())
    arr = strings.cast(pa.large_string())
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string())
    buf_off, buf_data = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(buf_off, dtype=np.int64, count=n + 1,
                         offset=8 * arr.offset)
    data = memoryview(buf_data)
    digests = bytearray(digest_size * n)
    dview = memoryview(digests)
    k = digest_size
    for i in range(n):
        dview[k * i:k * i + k] = algo(data[offs[i]:offs[i + 1]]).digest()
    hexall = binascii.hexlify(digests)
    out_offs = (np.arange(n + 1, dtype=np.int32) * (2 * k))
    return pa.Array.from_buffers(
        pa.utf8(), n,
        [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(hexall)],
    )


def sha256_hex(strings) -> pa.Array:
    """sha256 hex digest per string. Accepts a pyarrow Array/ChunkedArray or
    any iterable of str; returns a pyarrow string array (null -> null).

    hashlib releases the GIL per call and is C-speed; there is no vectorized
    sha256 in numpy/pyarrow, so one C call per row against zero-copy Arrow
    buffer slices is the practical floor (see ``_hex_digest_array``).
    """
    return _hex_digest_array(strings, hashlib.sha256, 32)


def md5_hex(strings) -> pa.Array:
    """md5 hex digest per string — matches DuckDB's ``md5()`` so engine-side
    signatures (WL relabel, exact dedup keys) can be verified in SQL."""
    return _hex_digest_array(strings, hashlib.md5, 16)


def stable_id64(strings) -> np.ndarray:
    """Stable non-negative int64 id per string via blake2b(digest_size=8).

    Used for vertex ids (``repo:path`` -> int64, FIXTURES.md §2). Collision
    probability over n keys ~ n^2 / 2^64 — negligible below ~10^9 vertices;
    ingest still collision-checks the dictionary (graph/build.py).

    Bit-stable by construction (it hashes the same UTF-8 bytes), but the hot
    path never materializes Python strings: Arrow input is hashed straight
    out of the array's data buffer via memoryview slices (blake2b is C and
    releases the GIL; no vectorized blake2 exists in numpy/pyarrow, so the
    remaining per-row cost is one C call + one memoryview slice), and the
    8-byte digests land in ONE buffer that converts with a single
    frombuffer + sign-bit mask instead of per-row int.from_bytes.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(list(strings), type=pa.string())
    arr = strings.cast(pa.large_string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    buf_off, buf_data = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(buf_off, dtype=np.int64, count=n + 1,
                         offset=8 * arr.offset)
    data = memoryview(buf_data)
    h = hashlib.blake2b
    digests = bytearray(8 * n)
    dview = memoryview(digests)
    for i in range(n):
        dview[8 * i:8 * i + 8] = h(
            data[offs[i]:offs[i + 1]], digest_size=8
        ).digest()
    # mask the sign bit: non-negative ids simplify packing/bucketing
    out = np.frombuffer(digests, dtype="<u8") & np.uint64(
        0x7FFF_FFFF_FFFF_FFFF
    )
    return out.view(np.int64)
