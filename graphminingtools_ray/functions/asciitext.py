"""Vectorized ASCII text kernels over raw Arrow UTF-8 buffers.

The text stages' reference semantics are defined by polars/Rust-regex
expressions (``\\S+`` tokens, ``[0-9]`` / punct character classes,
lowercase + stopword ``is_in``). Those regex scans run at only ~75 MB/s
per core; for pure-ASCII batches the same semantics reduce to byte-table
lookups + numpy stream passes at ~1 GB/s. This module provides that fast
path. Callers MUST check :func:`is_ascii` and fall back to the polars
path otherwise — on ASCII input every kernel here is exactly equivalent
(bit-identical downstream results):

- the regex classes ``\\s`` / ``[0-9]`` / ``[A-Za-zÀ-ÿ]`` restricted to
  bytes < 0x80 are exactly the byte sets in ``CLASS``;
- ``\\S+`` / ``[a-zA-ZÀ-ÿ]+`` run extraction over ASCII is maximal-run
  extraction over the corresponding byte classes;
- Unicode lowercasing of ASCII is ``b | 0x20`` on ``A-Z`` only, and for
  matching against all-lowercase-letter stopwords a blanket ``| 0x20`` is
  exact: ``b | 0x20`` lands in ``a-z`` iff ``b`` is that letter in either
  case (no other byte maps into ``a-z`` under OR 0x20).

Stopword matching packs tokens of <= 8 bytes into a little-endian uint64
and compares against precomputed stopword keys via ``searchsorted`` — an
EXACT string comparison (no hashing, no collisions); longer tokens cannot
equal any stopword. Reference analog for the hashing consumers:
``/root/reference/cs_Parsing.c`` canonical-string tokenization (the
reference also tokenizes byte streams, single-threaded).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

C_DIGIT, C_ALPHA, C_WS, C_OTHER = 0, 1, 2, 3

CLASS = np.full(256, C_OTHER, dtype=np.uint8)
CLASS[ord("0") : ord("9") + 1] = C_DIGIT
CLASS[ord("A") : ord("Z") + 1] = C_ALPHA
CLASS[ord("a") : ord("z") + 1] = C_ALPHA
for _b in b"\t\n\x0b\x0c\r ":
    CLASS[_b] = C_WS

# mask[cls] per token family
NONWS_MASK = np.array([True, True, False, True])  # \S+  (quality / shingles)
ALPHA_MASK = np.array([False, True, False, False])  # [a-zA-Z]+  (langid)

_LEN_MASK = np.zeros(9, dtype=np.uint64)
for _l in range(1, 9):
    _LEN_MASK[_l] = np.uint64((1 << (8 * _l)) - 1) if _l < 8 else ~np.uint64(0)
_LOWER = np.uint64(0x2020202020202020)


def arrow_utf8_view(texts):
    """``(data_u8, offsets_i64)`` view of an Arrow string array/chunked-array
    (zero-copy; offsets are ABSOLUTE indices into ``data``). Returns ``None``
    for non-Arrow input. Null slots read as empty strings (their offsets are
    equal), matching the stages' ``fill_null("")`` contract."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        # pandas Series / numpy object array / list of str: one conversion
        # pass buys byte-table scans for everything downstream (the Python
        # str objects already exist, so this costs no more than building the
        # equivalent polars series)
        try:
            texts = pa.array(texts, type=pa.string())
        except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError, ValueError):
            return None
    b = texts.cast(pa.large_binary())
    off = np.frombuffer(b.buffers()[1], dtype=np.int64)[
        b.offset : b.offset + len(b) + 1
    ]
    dbuf = b.buffers()[2]
    data = (
        np.frombuffer(dbuf, dtype=np.uint8)
        if dbuf is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return data, off


def is_ascii(data: np.ndarray, off: np.ndarray) -> bool:
    seg = data[off[0] : off[-1]]
    return len(seg) == 0 or int(seg.max()) < 0x80


def classify(data: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Byte-class array over the window ``data[off[0]:off[-1]]`` — compute
    once, share between :func:`class_doc_counts` and :func:`token_runs`."""
    return CLASS[data[int(off[0]) : int(off[-1])]]


def class_doc_counts(cls: np.ndarray, off: np.ndarray, class_id: int) -> np.ndarray:
    """Per-doc count of bytes of one class. No doc-id materialization: the
    class positions are compressed (flatnonzero) and counted per doc with a
    D-sized searchsorted — O(N) stream + O(D log M), instead of an 8N-byte
    ``np.repeat`` doc-id array + N-wide bincount."""
    idx = np.flatnonzero(cls == class_id)
    return np.diff(np.searchsorted(idx, off - off[0]))


def token_runs(
    data: np.ndarray, off: np.ndarray, class_mask: np.ndarray, cls=None
):
    """Maximal runs of in-class bytes, never crossing doc boundaries.

    Returns ``(starts, lens, tok_doc, intok)``: absolute run starts, run
    byte-lengths, owning doc index per run (runs emitted in stream order =
    polars ``extract_all(...).explode()`` order), and the in-class bool mask
    over ``data[off[0]:off[-1]]`` (for compressing token bytes). Pass a
    precomputed ``cls`` from :func:`classify` to share the byte-class pass."""
    lo, hi = int(off[0]), int(off[-1])
    n = hi - lo
    empty = (
        np.zeros(0, np.int64),
        np.zeros(0, np.int64),
        np.zeros(0, np.int64),
        np.zeros(0, bool),
    )
    if n == 0:
        return empty
    # in-class mask via direct comparisons (a 17-MB bool-table fancy-index
    # gather costs ~4× a vectorized compare): \S+ = not-whitespace bytes,
    # [a-zA-Z]+ = letter bytes; anything else falls back to the table gather
    if class_mask is NONWS_MASK:
        if cls is not None:
            intok = cls != C_WS
        else:
            d = data[lo:hi]
            intok = ((d > 13) & (d != 32)) | (d < 9)
    elif class_mask is ALPHA_MASK:
        if cls is not None:
            intok = cls == C_ALPHA
        else:
            e = data[lo:hi] | np.uint8(0x20)
            intok = (e >= 97) & (e <= 122)
    else:
        if cls is None:
            cls = CLASS[data[lo:hi]]
        intok = class_mask[cls]
    prev = np.empty_like(intok)
    prev[0] = False
    prev[1:] = intok[:-1]
    ds = off[:-1] - lo
    prev[ds[ds < n]] = False  # a doc's first byte never continues a run
    # (empty docs collapse onto the next doc's start — same effect; trailing
    # empty docs would index past the end and are skipped)
    starts = np.flatnonzero(intok & ~prev)
    nxt = np.empty_like(intok)
    nxt[-1] = False
    nxt[:-1] = intok[1:]
    lengths = np.diff(off)
    last_byte = off[1:] - 1 - lo
    nz = lengths > 0
    nxt[last_byte[nz]] = False  # a doc's last byte never extends a run
    ends = np.flatnonzero(intok & ~nxt)
    # tokens-per-doc via a D-sized searchsorted over the (sorted) start
    # positions, then one linear repeat — O(D log T), not O(T log D)
    D = len(off) - 1
    tok_per_doc = np.diff(np.searchsorted(starts, off - lo))
    tok_doc = np.repeat(np.arange(D, dtype=np.int64), tok_per_doc)
    return starts + lo, ends - starts + 1, tok_doc, intok


def pack_tokens_u64(data: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    """Little-endian uint64 keys for tokens of <= 8 bytes; longer tokens get
    the sentinel ``0xFF...FF`` (unreachable for ASCII content, whose bytes
    are < 0x80)."""
    T = len(starts)
    if T == 0:
        return np.zeros(0, np.uint64)
    pad = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
    # unaligned little-endian u64 window at every byte position: ONE gather
    # of T u64s (x86/arm handle unaligned loads natively), instead of a
    # (T, 8) byte-wise fancy index
    win = np.ndarray(
        shape=(len(pad) - 7,), dtype=np.uint64, buffer=pad, strides=(1,)
    )
    keys = win[starts] & _LEN_MASK[np.minimum(lens, 8)]
    keys[lens > 8] = ~np.uint64(0)
    return keys


def lower_keys(keys: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """OR 0x20 within each token's bytes (exact ASCII lowercase for matching
    against lowercase-letter-only vocabularies; see module docstring)."""
    return keys | (_LOWER & _LEN_MASK[np.minimum(lens, 8)])


def word_keys(words) -> np.ndarray:
    """Sorted uint64 keys of a vocabulary of <= 8-byte ASCII words."""
    ks = []
    for w in words:
        b = w.encode()
        assert len(b) <= 8, w
        ks.append(int.from_bytes(b.ljust(8, b"\0"), "little"))
    return np.sort(np.array(ks, dtype=np.uint64))


def match_sorted(keys: np.ndarray, sorted_vals: np.ndarray) -> np.ndarray:
    """Exact membership of each key in a small sorted uint64 vocabulary."""
    if len(keys) == 0 or len(sorted_vals) == 0:
        return np.zeros(len(keys), dtype=bool)
    idx = np.minimum(
        np.searchsorted(sorted_vals, keys), len(sorted_vals) - 1
    )
    return sorted_vals[idx] == keys
