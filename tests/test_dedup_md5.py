"""Brute-force oracles for the SQL-replicable md5 sketch family
(stages/dedup_md5.py): per-doc pure-Python references for tokenization,
windowed shingle strings, SimHash bit votes, winnowing minima and the
a*x+b mod 2^64 MinHash — plus determinism and the Arrow/list input parity
the pipelines rely on. The DuckDB twins themselves are certified by the
driver gate (oracle_sql entries simhash_md5 / winnow_md5 /
minhash_sketches_md5 / minhash_lsh_md5) and mirrored in
tests/test_queries_oracle.py."""

import hashlib
import struct

import numpy as np
import pyarrow as pa

from graphminingtools_ray.stages.dedup_md5 import (
    MinHasherMD5,
    md5_u64,
    md5_u64_one,
    minhash_md5_perms,
    shingle_sets_md5_batch,
    simhash_md5_batch,
    tokens_flat,
    window_join_strings,
    winnow_md5_stats,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox",
    "one",
    "",
    "a b",
    "x " * 40,
    "unicode éè tokens 中文 here",
    "repeat repeat repeat repeat repeat",
    None,
    "  leading and   multiple   spaces  ",
]


def _tok(text):
    return (text or "").split()


def _u64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:])[0]


def _shingles(toks, n):
    if len(toks) == 0:
        return []
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_md5_u64_matches_hashlib():
    strs = np.array(["hello", "", "a", "hello", "é"], dtype=object)
    out = md5_u64(strs)
    assert out.dtype == np.uint64
    assert list(out) == [_u64(s) for s in ["hello", "", "a", "hello", "é"]]
    assert md5_u64_one("hello") == _u64("hello")


def test_tokens_flat_matches_split_and_arrow_parity():
    toks, offs = tokens_flat(TEXTS)
    exp = [_tok(t) for t in TEXTS]
    assert list(np.diff(offs)) == [len(e) for e in exp]
    flat_exp = [t for e in exp for t in e]
    assert list(toks) == flat_exp
    # Arrow input path is bit-identical
    toks2, offs2 = tokens_flat(pa.array(TEXTS, pa.string()))
    assert list(toks2) == flat_exp and list(offs2) == list(offs)


def test_window_join_strings_semantics():
    for n in (1, 2, 3, 5):
        toks, offs = tokens_flat(TEXTS)
        sh, so = window_join_strings(toks, offs, n)
        exp = [_shingles(_tok(t), n) for t in TEXTS]
        assert list(np.diff(so)) == [len(e) for e in exp]
        assert list(sh) == [s for e in exp for s in e]


def test_simhash_md5_bruteforce():
    fps = simhash_md5_batch(TEXTS)
    for text, fp in zip(TEXTS, fps):
        toks = _tok(text)
        if not toks:
            assert fp == 0
            continue
        hs = [_u64(t) for t in toks]
        ref = 0
        for b in range(63):
            votes = sum((h >> b) & 1 for h in hs)
            if 2 * votes > len(hs):
                ref |= 1 << b
        assert int(fp) == ref
    # deterministic
    assert list(simhash_md5_batch(TEXTS)) == list(fps)


def test_winnow_md5_bruteforce():
    k, w = 5, 4
    n_fp, fp_min = winnow_md5_stats(TEXTS, k=k, window=w)
    for text, nf, fm in zip(TEXTS, n_fp, fp_min):
        shs = [_u64(s) for s in _shingles(_tok(text), k)]
        if not shs:
            assert nf == 0 and fm == 0
            continue
        if len(shs) < w:
            mins = {min(shs)}
        else:
            mins = {min(shs[i : i + w]) for i in range(len(shs) - w + 1)}
        assert int(nf) == len(mins)
        assert int(fm) == (min(mins) & 0x7FFF_FFFF_FFFF_FFFF)


def test_minhash_md5_bruteforce():
    h = MinHasherMD5()
    a, b = minhash_md5_perms(h.num_perm)
    assert all(int(x) & 1 for x in a)  # odd => bijection mod 2^64
    sets = shingle_sets_md5_batch(TEXTS, 3)
    sigs = h.signatures_from_sets(sets)
    for text, s, sig in zip(TEXTS, sets, sigs):
        exp_set = sorted({_u64(x) for x in _shingles(_tok(text), 3)})
        assert list(s) == exp_set
        if not exp_set:
            continue
        for i in range(h.num_perm):
            ref = min((int(a[i]) * x + int(b[i])) % (1 << 64) for x in exp_set)
            assert int(sig[i]) == ref


def test_minhash_lsh_md5_pipeline_bruteforce(ray_session):
    """Full pipeline vs a driver-side brute-force of the identical LSH rule
    (band = 4 consecutive minhash words, candidates share an exact band
    signature, survivors have set-Jaccard >= t) at sf0.001."""
    import duckdb

    from graphminingtools_ray.pipelines.text_q import minhash_lsh_md5

    sf = "/root/testdata/sf0.001"
    out = minhash_lsh_md5(sf)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    h = MinHasherMD5()
    sets = {
        int(d): {_u64(s) for s in _shingles(_tok(t), 3)}
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    sigs = {
        d: h.signatures_from_sets([np.array(sorted(s), np.uint64)])[0]
        for d, s in sets.items()
        if s
    }
    buckets: dict = {}
    for d, sig in sigs.items():
        for band in range(h.bands):
            key = (band, tuple(sig[band * h.rows : (band + 1) * h.rows]))
            buckets.setdefault(key, []).append(d)
    exp = set()
    for ds in buckets.values():
        ds = sorted(ds)[:256]
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                inter = len(sets[ds[i]] & sets[ds[j]])
                union = len(sets[ds[i]] | sets[ds[j]])
                if inter / max(1, union) >= 0.3:
                    exp.add((ds[i], ds[j], inter, union))
    got = set(
        zip(out["doc_a"], out["doc_b"], out["n_inter"], out["n_union"])
    )
    assert got == exp and len(got) > 0
