"""Deduplication stages: exact, MinHash+LSH, SimHash, winnowing fingerprints.

The reference's dedup primitive is canonicalize-then-trie-insert
(``/root/reference/searchTree.c:310-338``) and its near-dup primitive is the
min-hash sketch over a pattern poset (``minhashing.c:444-487``). Here the
same ideas over documents: a canonical key column + ``groupby(key)`` for
exact dedup; K-permutation MinHash signatures banded into LSH buckets +
``groupby(band)`` for near-dup candidates.

Hash family v2 (vectorized cutover): token hashes come from polars'
vectorized 64-bit string hash (one Rust pass per batch) and shingle hashes
from a uint64 polynomial combine of n consecutive token hashes — no
per-shingle Python/hashlib loop anywhere (that loop was the single biggest
CPU sink of the round-1 ingest bench). All stages remain deterministic
(fixed seeds) so results are reproducible across runs and num_cpus settings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1
_C = np.uint64(0x100000001B3)  # FNV-1a prime: shingle polynomial multiplier
_TOKEN_SEED = 2024  # hash-family version seed (v2)


def batch_text(batch):
    """The 'text' column of a ``pa.Table`` OR ``pd.DataFrame`` batch, in the
    form the vectorized text kernels consume: the Arrow column as-is
    (zero-copy into polars downstream) or a null-filled pandas Series. Lets
    every stage ``__call__`` here run ``batch_format="pyarrow"`` (no
    pandas boundary conversion per batch) while staying callable on plain
    DataFrames in tests."""
    texts = batch["text"]
    if isinstance(texts, pd.Series):
        return texts.fillna("")
    return texts


def batch_i64(col) -> np.ndarray:
    """int64 ndarray from an Arrow (chunked) array or pandas Series column."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    return np.asarray(col, dtype=np.int64)


def _finalize_mix(x: np.ndarray) -> np.ndarray:
    """xorshift-multiply finalizer (splitmix64 tail) — decorrelates the
    polynomial-combined shingle hashes before they feed minhash/banding."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def flat_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hash per whitespace token of each text, flattened across the
    batch. Returns ``(flat, offsets)`` with ``len(offsets) == len(texts)+1``.
    One vectorized polars pass: split → explode → hash.

    Accepts a Python list OR an Arrow string array/chunked-array; the Arrow
    path enters polars zero-copy (~2× — it skips materializing one Python
    ``str`` object per doc, which is pure allocator/bandwidth churn on big
    batches). Hashes depend only on string content, so both paths are
    bit-identical."""
    import polars as pl
    import pyarrow as pa

    from ..functions import asciitext as at

    view = at.arrow_utf8_view(texts)
    if view is not None and at.is_ascii(*view):
        # byte-table tokenization (regex extract_all is the dominant cost of
        # this function at ~75 MB/s/core); the token VALUES still go through
        # polars' vectorized hash, so the hash family is unchanged and the
        # output is bit-identical to the regex path
        data, off = view
        D = len(off) - 1
        starts, lens, tok_doc, intok = at.token_runs(data, off, at.NONWS_MASK)
        values = data[off[0] : off[-1]][intok]
        tok_off = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(lens, out=tok_off[1:])
        arr = pa.Array.from_buffers(
            pa.large_utf8(),
            len(starts),
            [None, pa.py_buffer(tok_off), pa.py_buffer(values)],
        )
        h = pl.from_arrow(arr).hash(seed=_TOKEN_SEED).to_numpy().astype(np.uint64)
        counts = np.bincount(tok_doc, minlength=D)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        return h, offsets
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        s = pl.from_arrow(arr.cast(pa.large_string())).fill_null("")
        s = s.rename("t")
    else:
        s = pl.Series("t", list(texts), dtype=pl.Utf8).fill_null("")
    toks = s.str.extract_all(r"\S+")
    counts = toks.list.len().to_numpy().astype(np.int64)
    # empty_as_null pinned: an empty token list must contribute 0 rows either
    # way (pre-2.0 it explodes to one null that drop_nulls removes; 2.0 emits
    # nothing) — pinning keeps the output stable across polars versions
    try:
        flat = toks.explode(empty_as_null=False).drop_nulls()
    except TypeError:  # older polars without the kwarg
        flat = toks.explode().drop_nulls()
    h = flat.hash(seed=_TOKEN_SEED).to_numpy().astype(np.uint64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return h, offsets


def _combine_window(h: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    """Polynomial combine of ``width`` consecutive values beginning at each
    start index (vectorized over starts)."""
    r = h[starts].copy()
    for j in range(1, width):
        r = r * _C + h[starts + j]
    return r


def shingle_hashes_flat(
    texts, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Word-n-gram shingle hashes per doc, flattened: ``(flat, offsets)``.

    Windowing semantics (v1-compatible): 0 tokens → no shingles; 0 < cnt < n
    → ONE shingle over all cnt tokens; else cnt-n+1 sliding windows of n.
    Fully vectorized: the window combine is an n-step strided numpy pass over
    the whole batch; short docs are handled per length class (< n classes).
    """
    h, offsets = flat_token_hashes(texts)
    counts = np.diff(offsets)
    out_counts = np.where(counts == 0, 0, np.where(counts < n, 1, counts - n + 1))
    out_offsets = np.concatenate([[0], np.cumsum(out_counts)])
    total = len(h)
    if total == 0:
        return np.zeros(0, np.uint64), out_offsets
    if n == 1:
        return _finalize_mix(h), out_offsets
    # Sequential formulation (the naive doc_of/pos_in_doc index machinery is
    # ~15 full-token-count array passes with gathers — pure DRAM traffic that
    # killed multicore scaling; this is 4 streaming passes + a compress):
    #   1. vals[i] = polynomial of h[i..i+n-1] for EVERY position (3 fused
    #      multiply-add passes for n=3),
    #   2. emit[i] = 1 iff a full window starting at i stays inside i's doc
    #      (built from a ±1 delta array + cumsum — O(#docs) scatter),
    #   3. out = vals[emit] — per-doc windows are contiguous ascending, so
    #      the compress lands them exactly at out_offsets order,
    #   4. short docs (0 < cnt < n: ONE shingle over all cnt tokens) are
    #      patched in at their start position before the compress.
    lim = total - n + 1
    vals = np.empty(total, dtype=np.uint64)
    if lim > 0:
        v = vals[:lim]
        np.multiply(h[:lim], _C, out=v)
        for j in range(1, n - 1):
            v += h[j : lim + j]
            v *= _C
        v += h[n - 1 : lim + n - 1]
    delta = np.zeros(total + 1, dtype=np.int32)
    long_docs = counts >= n
    if long_docs.any():
        starts_long = offsets[:-1][long_docs]
        ends_long = offsets[1:][long_docs]
        np.add.at(delta, starts_long, 1)
        np.add.at(delta, ends_long - (n - 1), -1)
    # short non-empty docs: one shingle over all cnt tokens, emitted at the
    # doc's start position (at most n-1 length classes, each vectorized)
    for l in range(1, n):
        docs_l = np.flatnonzero(counts == l)
        if len(docs_l) == 0:
            continue
        starts_l = offsets[:-1][docs_l]
        vals[starts_l] = _combine_window(h, starts_l, l)
        delta[starts_l] += 1
        delta[starts_l + 1] -= 1
    emit = np.cumsum(delta[:total], dtype=np.int32) > 0
    out = vals[emit]
    return _finalize_mix(out), out_offsets


def _char_shingle_hashes(text: str, n: int) -> np.ndarray:
    """Char-n-gram shingles of one text, via a vectorized rolling polynomial
    over the codepoint array (the fine-grained near-dup variant)."""
    if not text:
        return np.empty(0, np.uint64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    cp = _finalize_mix(cp + np.uint64(_TOKEN_SEED))
    if len(cp) < n:
        starts = np.array([0], dtype=np.int64)
        return _finalize_mix(_combine_window(cp, starts, len(cp)))
    starts = np.arange(len(cp) - n + 1)
    return _finalize_mix(_combine_window(cp, starts, n))


def _token_hashes(text: str, n: int = 3, chars: bool = False) -> np.ndarray:
    """Shingle hashes of ONE text (compat shim over the batch path)."""
    if chars:
        return _char_shingle_hashes(text, n)
    flat, _ = shingle_hashes_flat([text], n)
    return flat


class ExactDedupKey:
    """md5(text) canonical key per doc (SQL-verifiable: DuckDB ``md5``).
    Arrow-native: md5 runs over zero-copy slices of the Arrow data buffer
    (functions.hashing.md5_hex) — no per-row Python str round-trip."""

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.hashing import md5_hex

        texts = batch_text(batch)
        if not isinstance(texts, pd.Series):
            texts = pc.fill_null(texts, "")
        return pa.table(
            {"doc_id": batch["doc_id"], "text_md5": md5_hex(texts)}
        )


class MinHasher:
    """K-permutation MinHash over word-3-gram shingles, banded for LSH.

    Batch-vectorized: per permutation k, one multiply-add over ALL shingles
    of the batch + a segmented ``np.minimum.reduceat`` per doc — K vectorized
    passes total, no per-doc Python work. Permutations ``a*h + b`` in uint64
    with natural wraparound (standard vectorized min-wise family).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3, seed: int = 17):
        rng = np.random.default_rng(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        return self.signatures_batch([text])[0]

    def signature_from_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        vals = h[None, :] * self.a[:, None] + self.b[:, None]  # (K, S) u64
        return vals.min(axis=1)

    def signatures_batch(self, texts) -> np.ndarray:
        """(num_docs, num_perm) uint64 signatures; empty docs → all-zero."""
        flat, offsets = shingle_hashes_flat(texts, self.shingle_n)
        return self.signatures_from_flat(flat, offsets)

    def signatures_from_flat(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Signatures from an already-flattened shingle-hash array (e.g. the
        values buffer of a ``list<uint64>`` Arrow column). Min over a set is
        order- and multiplicity-independent, so feeding the SORTED-UNIQUE
        per-doc sets of ``shingle_sets_batch`` yields bit-identical
        signatures to hashing the raw text — the near-dup pipeline exploits
        this to shingle each doc exactly once."""
        counts = np.diff(offsets)
        sigs = np.zeros((len(counts), self.num_perm), dtype=np.uint64)
        nonempty = np.flatnonzero(counts > 0)
        if len(nonempty) == 0:
            return sigs
        starts = np.asarray(offsets[:-1][nonempty], dtype=np.int64)
        ends = starts + counts[nonempty]
        # cache-blocked: K permutation passes over a DRAM-sized flat array
        # are memory-bandwidth-bound (K×|flat|×8 bytes of traffic — the
        # multicore scaling killer); chunking doc groups to an L2-resident
        # span turns them into cache passes. Same results bit-for-bit.
        CH = 1 << 15  # 32k shingles ≈ 256 KiB per pass
        buf = np.empty(0, dtype=np.uint64)
        i = 0
        while i < len(starts):
            j = max(int(np.searchsorted(ends, starts[i] + CH, side="right")),
                    i + 1)
            lo, hi = int(starts[i]), int(ends[j - 1])
            seg = flat[lo:hi]
            segst = starts[i:j] - lo
            if len(buf) < len(seg):
                buf = np.empty(len(seg), dtype=np.uint64)
            v = buf[: len(seg)]
            rows = nonempty[i:j]
            for k in range(self.num_perm):
                np.multiply(seg, self.a[k], out=v)
                v += self.b[k]
                sigs[rows, k] = np.minimum.reduceat(v, segst)
            i = j
        return sigs

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(num_docs, bands) int64-positive band bucket keys — polynomial
        combine of each band's signature rows + finalizer mix."""
        chunked = sigs.reshape(len(sigs), self.bands, self.rows)
        bh = np.zeros((len(sigs), self.bands), dtype=np.uint64)
        for r in range(self.rows):
            bh = bh * _C + chunked[:, :, r]
        return (_finalize_mix(bh.ravel()).reshape(bh.shape) >> np.uint64(1)).astype(
            np.int64
        )

    def __call__(self, batch):
        """Explode each doc into `bands` rows: (doc_id, band_id, band_hash).
        Arrow-native (the text column enters polars zero-copy)."""
        import pyarrow as pa

        doc_ids = batch_i64(batch["doc_id"])
        bh = self.band_hashes(self.signatures_batch(batch_text(batch)))
        return pa.table(
            {
                "doc_id": np.repeat(doc_ids, self.bands),
                "band_id": np.tile(
                    np.arange(self.bands, dtype=np.int64), len(doc_ids)
                ),
                "band_hash": bh.ravel(),
            }
        )


def jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    ha = np.unique(_token_hashes(text_a, n))
    hb = np.unique(_token_hashes(text_b, n))
    if len(ha) == 0 and len(hb) == 0:
        return 1.0
    inter = len(np.intersect1d(ha, hb, assume_unique=True))
    union = len(ha) + len(hb) - inter
    return inter / max(1, union)


def jaccard_pairs_vectorized(
    texts_a: list[str], texts_b: list[str], n: int = 3
) -> np.ndarray:
    """Exact shingle-set Jaccard for many (a, b) pairs — fully vectorized:
    one batched hashing pass over all 2m texts, a global lexsort to dedupe
    each doc's shingle set, and a second lexsort per pair to count the union
    (|A∩B| = |A|+|B|-|A∪B|). No per-pair Python loop. Used by the
    distributed near-dup verify stage."""
    m = len(texts_a)
    if m == 0:
        return np.empty(0, np.float64)
    flat, offsets = shingle_hashes_flat(list(texts_a) + list(texts_b), n)
    counts = np.diff(offsets)
    doc_of = np.repeat(np.arange(2 * m), counts)
    order = np.lexsort((flat, doc_of))
    d, v = doc_of[order], flat[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
    d, v = d[keep], v[keep]
    set_sizes = np.bincount(d, minlength=2 * m)
    pair = d % m
    order2 = np.lexsort((v, pair))
    p2, v2 = pair[order2], v[order2]
    dk = np.ones(len(p2), dtype=bool)
    dk[1:] = (p2[1:] != p2[:-1]) | (v2[1:] != v2[:-1])
    union = np.bincount(p2[dk], minlength=m)
    sa, sb = set_sizes[:m], set_sizes[m:]
    inter = sa + sb - union
    return np.where(
        (sa == 0) & (sb == 0), 1.0, inter / np.maximum(1, union)
    ).astype(np.float64)


def shingle_sets_batch(texts, n: int = 3) -> list[np.ndarray]:
    """Per-doc SORTED UNIQUE shingle-hash arrays (the exact-Jaccard operand),
    one vectorized hashing pass + one global lexsort for the dedup."""
    flat, offsets = shingle_hashes_flat(texts, n)
    counts = np.diff(offsets)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    order = np.lexsort((flat, doc_of))
    d, v = doc_of[order], flat[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
    d, v = d[keep], v[keep]
    sizes = np.bincount(d, minlength=len(counts))
    offs = np.concatenate([[0], np.cumsum(sizes)])
    return [v[offs[i]: offs[i + 1]] for i in range(len(counts))]


def jaccard_counts_sorted_sets(
    sets_a: list[np.ndarray], sets_b: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """(|A∩B|, |A∪B|) int64 per pair of pre-sorted-unique uint64 arrays —
    the exact-integer operand the SQL-oracled md5 twin emits (a float ratio
    would re-open summation/rounding ulp questions the driver gate hashes
    on). Same vectorized union-count kernel as :func:`jaccard_sorted_sets`."""
    m = len(sets_a)
    if m == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    sa = np.array([len(s) for s in sets_a], dtype=np.int64)
    sb = np.array([len(s) for s in sets_b], dtype=np.int64)
    vals = np.concatenate(
        [np.concatenate(sets_a) if sa.sum() else np.empty(0, np.uint64),
         np.concatenate(sets_b) if sb.sum() else np.empty(0, np.uint64)]
    )
    pair = np.concatenate(
        [np.repeat(np.arange(m), sa), np.repeat(np.arange(m), sb)]
    )
    order = np.lexsort((vals, pair))
    p2, v2 = pair[order], vals[order]
    dk = np.ones(len(p2), dtype=bool)
    dk[1:] = (p2[1:] != p2[:-1]) | (v2[1:] != v2[:-1])
    union = np.bincount(p2[dk], minlength=m)
    inter = sa + sb - union
    return inter.astype(np.int64), union.astype(np.int64)


def jaccard_sorted_sets(sets_a: list[np.ndarray], sets_b: list[np.ndarray]) -> np.ndarray:
    """Exact Jaccard for pairs of pre-sorted-unique uint64 arrays — the
    union-count trick (|A∩B| = |A|+|B|-|A∪B|), fully vectorized across
    pairs via one global lexsort."""
    m = len(sets_a)
    if m == 0:
        return np.empty(0, np.float64)
    sa = np.array([len(s) for s in sets_a], dtype=np.int64)
    sb = np.array([len(s) for s in sets_b], dtype=np.int64)
    vals = np.concatenate(
        [np.concatenate(sets_a) if sa.sum() else np.empty(0, np.uint64),
         np.concatenate(sets_b) if sb.sum() else np.empty(0, np.uint64)]
    )
    pair = np.concatenate(
        [np.repeat(np.arange(m), sa), np.repeat(np.arange(m), sb)]
    )
    order = np.lexsort((vals, pair))
    p2, v2 = pair[order], vals[order]
    dk = np.ones(len(p2), dtype=bool)
    dk[1:] = (p2[1:] != p2[:-1]) | (v2[1:] != v2[:-1])
    union = np.bincount(p2[dk], minlength=m)
    inter = sa + sb - union
    return np.where(
        (sa == 0) & (sb == 0), 1.0, inter / np.maximum(1, union)
    ).astype(np.float64)


class SimHasher:
    """64-bit SimHash over token hashes: bit b of the fingerprint is the sign
    of the sum of ±1 votes from each token's hash bit b. Batch-vectorized:
    one (T, 64) bit matrix per batch + segmented ``np.add.reduceat``."""

    def __init__(self, shingle_n: int = 1):
        self.shingle_n = shingle_n
        self.bit_masks = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def fingerprints_batch(self, texts) -> np.ndarray:
        flat, offsets = shingle_hashes_flat(texts, self.shingle_n)
        return self.fingerprints_from_flat(flat, offsets)

    def fingerprints_from_flat(
        self, flat: np.ndarray, offsets: np.ndarray
    ) -> np.ndarray:
        """Fingerprints from an already-hashed token/shingle stream — lets
        alternate base-hash families (e.g. the SQL-replicable md5 twins in
        stages/dedup_md5.py) reuse the vectorized bit-vote kernel."""
        counts = np.diff(offsets)
        fps = np.zeros(len(counts), dtype=np.int64)
        nonempty = np.flatnonzero(counts > 0)
        if len(nonempty):
            bits = (
                (flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int64)
            starts = offsets[:-1][nonempty]
            votes = np.add.reduceat(bits, starts, axis=0)  # (D≠0, 64)
            pos = votes * 2 > counts[nonempty, None]
            fp = (pos.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            fps[nonempty] = (fp & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
        return fps

    def fingerprint(self, text: str) -> int:
        return int(self.fingerprints_batch([text])[0])

    def __call__(self, batch):
        import pyarrow as pa

        fps = self.fingerprints_batch(batch_text(batch))
        return pa.table({"doc_id": batch["doc_id"], "simhash": fps})


class WinnowFingerprint:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    public algorithm): k-gram shingle hashes, min per sliding window of w,
    deduplicated. Emits summary stats per doc (count + min fingerprint).
    Batch-vectorized: one sliding_window_view over the flattened shingle
    array + per-doc distinct counting via lexsort boundaries."""

    def __init__(self, k: int = 5, window: int = 4):
        self.k = k
        self.window = window

    def fingerprints(self, text: str) -> np.ndarray:
        h = _token_hashes(text, self.k)
        if len(h) == 0:
            return np.zeros(0, dtype=np.uint64)
        if len(h) <= self.window:
            return np.unique(h.min(keepdims=True))
        sw = np.lib.stride_tricks.sliding_window_view(h, self.window)
        return np.unique(sw.min(axis=1))

    def stats_batch(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """(n_fingerprints, fp_min) per doc, vectorized across the batch."""
        flat, offsets = shingle_hashes_flat(texts, self.k)
        return self.stats_from_flat(flat, offsets)

    def stats_from_flat(
        self, flat: np.ndarray, offsets: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Stats from an already-computed k-gram shingle stream (RAW order,
        not deduped — winnowing is window-order-sensitive). Lets callers that
        also minhash with the same shingle width share ONE hashing pass."""
        w = self.window
        counts = np.diff(offsets)
        D = len(counts)
        n_fp = np.zeros(D, dtype=np.int64)
        fp_min = np.zeros(D, dtype=np.int64)
        total = len(flat)
        if total == 0:
            return n_fp, fp_min
        # Same streaming shape as shingle_hashes_flat (winnowing's window
        # minima have exactly the shingle-window emit structure, with min in
        # place of the polynomial): per-position sliding minima + a ±1 delta
        # cumsum emit mask — no full-size pos_in_doc/cnt_rep/doc_of repeats.
        # Docs with cnt >= w emit cnt-w+1 window minima; docs with
        # 0 < cnt < w emit ONE min over all cnt values at their start
        # position (cnt == w is the degenerate single full-width window —
        # identical either way).
        lim = total - w + 1
        vals = np.empty(total, dtype=np.uint64)
        if lim > 0:
            np.lib.stride_tricks.sliding_window_view(flat, w).min(
                axis=1, out=vals[:lim]
            )
        delta = np.zeros(total + 1, dtype=np.int32)
        long_docs = counts >= w
        if long_docs.any():
            starts_long = offsets[:-1][long_docs]
            ends_long = offsets[1:][long_docs]
            np.add.at(delta, starts_long, 1)
            np.add.at(delta, ends_long - (w - 1), -1)
        for l in range(1, w):
            docs_l = np.flatnonzero(counts == l)
            if len(docs_l) == 0:
                continue
            starts_l = offsets[:-1][docs_l]
            mins = flat[starts_l].copy()
            for j in range(1, l):
                np.minimum(mins, flat[starts_l + j], out=mins)
            vals[starts_l] = mins
            delta[starts_l] += 1
            delta[starts_l + 1] -= 1
        emit = np.cumsum(delta[:total], dtype=np.int32) > 0
        sel_vals = vals[emit]
        out_counts = np.where(
            counts == 0, 0, np.where(counts < w, 1, counts - w + 1)
        )
        sel_docs = np.repeat(np.arange(D), out_counts)
        # winnowing's whole point is that overlapping windows mostly share
        # their minimum — consecutive (doc, val) duplicates are ~(w-1)/w of
        # the stream. Dropping them first is a cheap linear pass that shrinks
        # the O(N log N) random-access lexsort below by ~w×; the final
        # distinct/first masks after sorting are unchanged (dedup of
        # consecutive equals never removes the last copy of a distinct pair).
        if len(sel_docs) > 1:
            keep = np.ones(len(sel_docs), dtype=bool)
            keep[1:] = (sel_docs[1:] != sel_docs[:-1]) | (
                sel_vals[1:] != sel_vals[:-1]
            )
            sel_docs = sel_docs[keep]
            sel_vals = sel_vals[keep]
        if len(sel_docs) == 0:
            return n_fp, fp_min
        # per-doc distinct count + min via a polars hash group-by (exact —
        # hash table, not a sketch): ~5× an indirect numpy lexsort of the
        # (doc, val) pairs, which was the dominant cost of this stage
        import polars as pl

        agg = (
            pl.DataFrame({"d": sel_docs, "v": sel_vals})
            .group_by("d")
            .agg(
                pl.col("v").n_unique().alias("nu"),
                pl.col("v").min().alias("mn"),
            )
        )
        d_ = agg["d"].to_numpy()
        n_fp[d_] = agg["nu"].to_numpy().astype(np.int64)
        fp_min[d_] = (
            agg["mn"].to_numpy().astype(np.uint64)
            & np.uint64(0x7FFF_FFFF_FFFF_FFFF)
        ).astype(np.int64)
        return n_fp, fp_min

    def __call__(self, batch):
        import pyarrow as pa

        n_fp, fp_min = self.stats_batch(batch_text(batch))
        return pa.table(
            {"doc_id": batch["doc_id"], "n_fingerprints": n_fp, "fp_min": fp_min}
        )
