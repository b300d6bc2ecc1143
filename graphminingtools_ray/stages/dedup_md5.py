"""SQL-replicable (md5-based) twins of the dedup sketch family.

The default family (stages/dedup.py) base-hashes tokens with polars'
vectorized hash — the fast path, but not reproducible in ANSI SQL, so the
driver's DuckDB gate can only record those queries rows-only. These twins
swap ONLY the base hash for the lower-64 little-endian word of MD5 (exactly
DuckDB's ``md5_number_lower``) and build shingles as explicit
space-joined token strings (exactly ``array_to_string(list_slice(...))``),
so every downstream stage — SimHash bit votes, winnowing window minima,
k-permutation MinHash, LSH banding, exact-Jaccard verify — has a value-exact
DuckDB twin and flips from rows-only to a full driver-gate row.

Vectorization: tokens come from one polars ``extract_all`` pass (same
tokenizer as the default family: whitespace ``\\S+``); md5 runs once per
UNIQUE token/shingle (hashlib releases the GIL) and is gathered back through
the inverse index, so hashing cost scales with vocabulary, not corpus. The
windowed shingle-string builder reuses the delta/emit-mask structure of
``shingle_hashes_flat`` (same windowing semantics: 0 tokens -> no shingles,
0 < cnt < n -> ONE shingle over all cnt tokens, else cnt-n+1 windows).

Reference analog: minhashing.c:444 (sketching), plus the SIGMOD'03
winnowing and Charikar'02 SimHash public algorithms; these twins exist for
oracle certification, the tuned polars-hash family remains the scale path.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

_U64_MOD = 1 << 64


def md5_u64(strings: np.ndarray) -> np.ndarray:
    """uint64 per string: little-endian of md5 digest bytes 8..16 — exactly
    DuckDB's ``md5_number_lower``. Hashes each UNIQUE string once."""
    if len(strings) == 0:
        return np.empty(0, np.uint64)
    uniq, inv = np.unique(strings, return_inverse=True)
    vals = np.fromiter(
        (
            struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:])[0]
            for s in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return vals[inv]


def md5_u64_one(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:])[0]


def tokens_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace tokens (``\\S+``, the default family's tokenizer) per doc,
    flattened: (object ndarray of token strings, int64 offsets)."""
    import polars as pl
    import pyarrow as pa

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        s = pl.from_arrow(arr.cast(pa.large_string())).fill_null("")
        s = s.rename("t")
    else:
        s = pl.Series("t", list(texts), dtype=pl.Utf8).fill_null("")
    toks = s.str.extract_all(r"\S+")
    counts = toks.list.len().to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    flat = toks.explode().drop_nulls().to_numpy()
    if flat.dtype != object:
        flat = flat.astype(object)
    # pre-2.0 polars explodes an empty list to one null (dropped above);
    # guard the invariant either way
    assert len(flat) == offsets[-1]
    return flat, offsets


def window_join_strings(
    toks: np.ndarray, offsets: np.ndarray, n: int, sep: str = " "
) -> tuple[np.ndarray, np.ndarray]:
    """Word-n-gram shingle STRINGS per doc (sep-joined), flattened —
    the value DuckDB rebuilds as ``array_to_string(toks[i:i+n-1], ' ')``.
    Same windowing semantics and emit-mask structure as
    ``shingle_hashes_flat``."""
    counts = np.diff(offsets)
    out_counts = np.where(counts == 0, 0, np.where(counts < n, 1, counts - n + 1))
    out_offsets = np.concatenate([[0], np.cumsum(out_counts)])
    total = len(toks)
    if total == 0:
        return np.empty(0, object), out_offsets
    if n == 1:
        return toks, out_offsets
    lim = total - n + 1
    vals = np.empty(total, dtype=object)
    if lim > 0:
        acc = toks[:lim].copy()
        for j in range(1, n):
            acc = acc + sep
            acc = acc + toks[j : lim + j]
        vals[:lim] = acc
    delta = np.zeros(total + 1, dtype=np.int32)
    long_docs = counts >= n
    if long_docs.any():
        starts_long = offsets[:-1][long_docs]
        ends_long = offsets[1:][long_docs]
        np.add.at(delta, starts_long, 1)
        np.add.at(delta, ends_long - (n - 1), -1)
    for l in range(1, n):
        docs_l = np.flatnonzero(counts == l)
        if len(docs_l) == 0:
            continue
        starts_l = offsets[:-1][docs_l]
        acc = toks[starts_l].copy()
        for j in range(1, l):
            acc = acc + sep
            acc = acc + toks[starts_l + j]
        vals[starts_l] = acc
        delta[starts_l] += 1
        delta[starts_l + 1] -= 1
    emit = np.cumsum(delta[:total], dtype=np.int32) > 0
    return vals[emit], out_offsets


def shingle_hashes_md5(
    texts, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """md5_u64 per word-n-gram shingle string, flattened (raw window order,
    with multiplicity — the winnowing operand)."""
    toks, offs = tokens_flat(texts)
    sh, out_offs = window_join_strings(toks, offs, n)
    return md5_u64(sh), out_offs


def shingle_sets_md5_batch(texts, n: int = 3) -> list[np.ndarray]:
    """Per-doc SORTED UNIQUE md5 shingle-hash sets (the exact-Jaccard and
    MinHash operand of the md5 family)."""
    flat, offsets = shingle_hashes_md5(texts, n)
    counts = np.diff(offsets)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    order = np.lexsort((flat, doc_of))
    d, v = doc_of[order], flat[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
    d, v = d[keep], v[keep]
    sizes = np.bincount(d, minlength=len(counts))
    offs = np.concatenate([[0], np.cumsum(sizes)])
    return [v[offs[i] : offs[i + 1]] for i in range(len(counts))]


def minhash_md5_perms(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic permutation constants derived FROM md5 so the SQL twin
    can embed them as literals: a_i = md5_u64('perm-a-i') | 1 (odd => the
    map x -> a*x+b mod 2^64 is a bijection), b_i = md5_u64('perm-b-i')."""
    a = np.array(
        [md5_u64_one(f"perm-a-{i}") | 1 for i in range(num_perm)], np.uint64
    )
    b = np.array([md5_u64_one(f"perm-b-{i}") for i in range(num_perm)], np.uint64)
    return a, b


class MinHasherMD5:
    """K-permutation MinHash over md5 word-n-gram shingle hashes, with
    md5-derived permutation constants — bit-replicable in DuckDB (the
    a*x+b wraparound multiply is 32-bit split arithmetic in HUGEINT).
    Reuses the default family's vectorized signature kernel."""

    def __init__(self, num_perm: int = 32, bands: int = 8, shingle_n: int = 3):
        from .dedup import MinHasher

        self._mh = MinHasher(num_perm=num_perm, bands=bands, shingle_n=shingle_n)
        self._mh.a, self._mh.b = minhash_md5_perms(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n

    def signatures_from_sets(self, sets: list[np.ndarray]) -> np.ndarray:
        sizes = np.array([len(s) for s in sets], np.int64)
        flat = (
            np.concatenate(sets).astype(np.uint64)
            if sizes.sum()
            else np.empty(0, np.uint64)
        )
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        return self._mh.signatures_from_flat(flat, offsets)

    def signatures_batch(self, texts) -> np.ndarray:
        return self.signatures_from_sets(shingle_sets_md5_batch(texts, self.shingle_n))

    def signatures_from_flat(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        return self._mh.signatures_from_flat(flat, offsets)

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """Routing-only band bucket keys (the default family's mix) — the
        md5 pipeline groups candidates by the EXACT per-band signature words
        (collision-free, what the SQL twin groups by); this hash only
        decides which exchange bucket carries the group."""
        return self._mh.band_hashes(sigs)


def simhash_md5_batch(texts) -> np.ndarray:
    """SimHash over per-token md5_u64 votes (multiplicity counted), masked
    to the low 63 bits — the default SimHasher's kernel on the md5 base."""
    from .dedup import SimHasher

    toks, offs = tokens_flat(texts)
    return SimHasher().fingerprints_from_flat(md5_u64(toks), offs)


def winnow_md5_stats(texts, k: int = 5, window: int = 4):
    """Winnowing stats (n_fingerprints, fp_min) over md5 k-gram shingle
    hashes; fp_min is the uint64 minimum masked to the low 63 bits (the
    default stage's convention — the SQL twin applies the same mask)."""
    from .dedup import WinnowFingerprint

    flat, offsets = shingle_hashes_md5(texts, k)
    return WinnowFingerprint(k=k, window=window).stats_from_flat(flat, offsets)


class SimHashMD5Stage:
    def __call__(self, batch):
        import pyarrow as pa

        from .dedup import batch_text

        fps = simhash_md5_batch(batch_text(batch))
        return pa.table({"doc_id": batch["doc_id"], "simhash": fps})


class WinnowMD5Stage:
    def __init__(self, k: int = 5, window: int = 4):
        self.k = k
        self.window = window

    def __call__(self, batch):
        import pyarrow as pa

        from .dedup import batch_text

        n_fp, fp_min = winnow_md5_stats(
            batch_text(batch), k=self.k, window=self.window
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "n_fingerprints": n_fp, "fp_min": fp_min}
        )
