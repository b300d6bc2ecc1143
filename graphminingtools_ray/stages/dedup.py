"""Deduplication stages: exact, MinHash+LSH, SimHash, winnowing fingerprints.

The reference's dedup primitive is canonicalize-then-trie-insert
(``/root/reference/searchTree.c:310-338``) and its near-dup primitive is the
min-hash sketch over a pattern poset (``minhashing.c:444-487``). Here the
same ideas over documents: a canonical key column + ``groupby(key)`` for
exact dedup; K-permutation MinHash signatures banded into LSH buckets +
``groupby(band)`` for near-dup candidates.

All stages are deterministic (fixed seeds, blake2b hashing) so results are
reproducible across runs and num_cpus settings.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _token_hashes(text: str, n: int = 3, chars: bool = False) -> np.ndarray:
    """64-bit hashes of word n-gram (default) or character n-gram shingles.
    Char shingles are the standard fine-grained near-dup variant (catch
    edits inside words; much denser shingle sets)."""
    if chars:
        if len(text) < n:
            shingles = [text] if text else []
        else:
            shingles = [text[i : i + n] for i in range(len(text) - n + 1)]
    else:
        toks = text.split()
        if len(toks) < n:
            shingles = [" ".join(toks)] if toks else []
        else:
            shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
        )
    return out


class ExactDedupKey:
    """md5(text) canonical key per doc (SQL-verifiable: DuckDB ``md5``)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keys = [
            hashlib.md5(t.encode()).hexdigest() for t in batch["text"].fillna("")
        ]
        return pd.DataFrame({"doc_id": batch["doc_id"], "text_md5": keys})


class MinHasher:
    """K-permutation MinHash over word-3-gram shingles, banded for LSH.

    Emits per doc: ``sig`` (K uint64 minima) and ``(band_id, band_hash)``
    rows for the bucket groupby. Permutations ``(a*h + b) mod p`` with a
    fixed-seed RNG built once per actor.
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
        h = _token_hashes(text, self.shingle_n)
        return self.signature_from_hashes(h)

    def signature_from_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # multiply-add in uint64 with natural wraparound (the standard
        # vectorized min-wise permutation family; avoids 128-bit mod-prime)
        vals = h[None, :] * self.a[:, None] + self.b[:, None]  # (K, S) u64
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Explode each doc into `bands` rows: (doc_id, band_id, band_hash)."""
        doc_ids, band_ids, band_hashes = [], [], []
        for did, text in zip(batch["doc_id"], batch["text"].fillna("")):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows : (b + 1) * self.rows]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                doc_ids.append(did)
                band_ids.append(b)
                band_hashes.append(int.from_bytes(bh, "little") >> 1)
        return pd.DataFrame(
            {
                "doc_id": np.asarray(doc_ids, dtype=np.int64),
                "band_id": np.asarray(band_ids, dtype=np.int64),
                "band_hash": np.asarray(band_hashes, dtype=np.int64),
            }
        )


def jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    ha = set(_token_hashes(text_a, n).tolist())
    hb = set(_token_hashes(text_b, n).tolist())
    if not ha and not hb:
        return 1.0
    return len(ha & hb) / max(1, len(ha | hb))


class SimHasher:
    """64-bit SimHash over token hashes: bit b of the fingerprint is the sign
    of the sum of ±1 votes from each token's hash bit b."""

    def __init__(self, shingle_n: int = 1):
        self.shingle_n = shingle_n
        self.bit_masks = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def fingerprint(self, text: str) -> int:
        h = _token_hashes(text, self.shingle_n)
        if len(h) == 0:
            return 0
        bits = (h[:, None] & self.bit_masks[None, :]) != 0  # (T, 64)
        votes = bits.sum(axis=0) * 2 - len(h)  # ±1 votes summed
        fp = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            fp |= self.bit_masks[b]
        return int(fp) & 0x7FFF_FFFF_FFFF_FFFF  # keep int64-positive

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = [self.fingerprint(t) for t in batch["text"].fillna("")]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "simhash": np.asarray(fps, dtype=np.int64)}
        )


class WinnowFingerprint:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    public algorithm): k-gram rolling hashes, min per sliding window of w,
    deduplicated. Emits summary stats per doc (count + min fingerprint)."""

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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_fp, fp_min = [], []
        for t in batch["text"].fillna(""):
            fps = self.fingerprints(t)
            n_fp.append(len(fps))
            fp_min.append(int(fps.min()) & 0x7FFF_FFFF_FFFF_FFFF if len(fps) else 0)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": np.asarray(n_fp, dtype=np.int64),
                "fp_min": np.asarray(fp_min, dtype=np.int64),
            }
        )
