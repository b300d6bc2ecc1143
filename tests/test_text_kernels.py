"""Parity tests for the ASCII fast-path text kernels (functions/asciitext.py)
vs the polars/regex reference paths, and per-doc brute-force oracles for the
batched shingle/winnow vectorizations.

These guard the bit-identical contract: every fast path must produce exactly
the reference-path results (the SQL oracles for langid/quality depend on it),
and the batch vectorizations must equal their per-doc formulations.
Regression coverage for the winnow short-doc reduceat bug (minimum.reduceat
segments spanning intervening docs when short docs are non-adjacent).
"""

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import pytest

from graphminingtools_ray.stages.dedup import (
    _TOKEN_SEED,
    WinnowFingerprint,
    flat_token_hashes,
    shingle_hashes_flat,
)
from graphminingtools_ray.stages.text import LangIdHeuristic, QualityScore, _pl_utf8


def _ref_token_hashes(texts):
    s = pl.Series("t", list(texts), dtype=pl.Utf8).fill_null("")
    toks = s.str.extract_all(r"\S+")
    counts = toks.list.len().to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls()
    h = flat.hash(seed=_TOKEN_SEED).to_numpy().astype(np.uint64)
    return h, np.concatenate([[0], np.cumsum(counts)])


def _ref_lang(texts):
    lid = LangIdHeuristic()
    s = _pl_utf8(list(texts))
    toks = s.str.extract_all(lid.token_re)
    counts = toks.list.len().to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls().str.to_lowercase()
    doc_of = np.repeat(np.arange(len(counts)), counts)
    scores = np.zeros((len(counts), len(lid.langs)), dtype=np.int64)
    for li, table in enumerate(lid.tables):
        hits = flat.is_in(table).to_numpy()
        np.add.at(scores[:, li], doc_of[hits], 1)
    best = scores.max(axis=1)
    arg = scores.argmax(axis=1)
    langs = np.asarray(lid.langs, dtype=object)
    return np.where(best > 0, langs[arg], "unk")


def _gen_docs(rng, vocab, n_docs):
    docs = []
    for _ in range(n_docs):
        ln = int(rng.integers(0, 20))
        words = rng.choice(vocab, ln)
        seps = rng.choice([" ", "  ", "\t", "\n", " \t "], ln) if ln else []
        docs.append("".join(w + s for w, s in zip(words, seps)))
    return docs


VOCAB = [
    "the", "The", "THE", "la", "DE", "und", "pour", "x1", "don't",
    "a" * 8, "a" * 9, "und!", "123", "!!", "@la", "que", "is", "it",
]

EDGE_CASES = [
    [],
    [""],
    ["   "],
    ["\t\n"],
    ["a"],
    ["The la"],
    ["THE THE the"],
    ["a" * 8 + " " + "b" * 9],
    ["9to5 to  in"],
    [" lead trail "],
    ["", "", "the"],
    ["the", "", ""],
]


@pytest.mark.parametrize("seed", [3, 7])
def test_fast_paths_match_polars_reference(seed):
    rng = np.random.default_rng(seed)
    q = QualityScore()
    lid = LangIdHeuristic()
    cases = [_gen_docs(rng, VOCAB, int(rng.integers(0, 9))) for _ in range(40)]
    cases += EDGE_CASES
    for docs in cases:
        exp_l = _ref_lang(docs)
        exp_h, exp_o = _ref_token_hashes(docs)
        # quality reference = force fallback by appending a non-ascii doc
        exp_q = q.score(pa.array(list(docs) + ["é"], type=pa.string()))[:-1]
        for form in (
            docs,
            pa.array(docs, type=pa.string()),
            pd.Series(docs, dtype=object),
        ):
            assert np.array_equal(q.score(form), exp_q)
            assert list(lid.predict(form)) == list(exp_l)
            gh, go = flat_token_hashes(form)
            assert np.array_equal(gh, exp_h)
            assert np.array_equal(go, exp_o)


def test_fast_paths_null_and_sliced_arrow():
    q = QualityScore()
    lid = LangIdHeuristic()
    arr = pa.array(["the la", None, ""], type=pa.string())
    assert np.array_equal(
        q.score(arr), q.score(pa.array(["the la", "", "", "é"]))[:-1]
    )
    assert list(lid.predict(arr)) == list(_ref_lang(["the la", "", ""]))
    gh, go = flat_token_hashes(arr)
    eh, eo = _ref_token_hashes(["the la", "", ""])
    assert np.array_equal(gh, eh) and np.array_equal(go, eo)
    big = pa.array(["x y z", "the und la", "  ", "w"], type=pa.string())
    sl = big.slice(1, 2)
    assert list(lid.predict(sl)) == list(_ref_lang(["the und la", "  "]))
    gh, go = flat_token_hashes(sl)
    eh, eo = _ref_token_hashes(["the und la", "  "])
    assert np.array_equal(gh, eh) and np.array_equal(go, eo)


def test_non_ascii_falls_back_identically():
    docs = ["hello für welt", "воды the", "the für"]
    lid = LangIdHeuristic()
    assert list(lid.predict(pa.array(docs))) == list(_ref_lang(docs))
    gh, go = flat_token_hashes(pa.array(docs))
    eh, eo = _ref_token_hashes(docs)
    assert np.array_equal(gh, eh) and np.array_equal(go, eo)


def test_shingle_windowing_vs_per_doc():
    rng = np.random.default_rng(9)
    words = ["w%d" % i for i in range(40)]
    docs = [
        " ".join(rng.choice(words, int(rng.integers(0, 12))))
        for _ in range(120)
    ]
    for n in (1, 2, 3, 5):
        flat, offs = shingle_hashes_flat(docs, n)
        for i, d in enumerate(docs):
            f1, o1 = shingle_hashes_flat([d], n)
            assert np.array_equal(flat[offs[i] : offs[i + 1]], f1), (n, i)


@pytest.mark.parametrize("k,w", [(2, 2), (3, 4), (5, 3), (4, 8), (3, 1)])
def test_winnow_stats_vs_per_doc_bruteforce(k, w):
    """Mixed short/long docs in one batch — the regression shape for the
    reduceat-over-nonadjacent-segments fp_min bug."""
    rng = np.random.default_rng(5)
    words = ["w%d" % i for i in range(30)]
    docs = [
        " ".join(rng.choice(words, int(rng.integers(0, 40))))
        for _ in range(150)
    ]
    docs += [docs[3], docs[3] + " " + docs[3], ""]
    wf = WinnowFingerprint(k=k, window=w)
    n_fp, fp_min = wf.stats_batch(docs)
    for i, d in enumerate(docs):
        fps = wf.fingerprints(d)
        assert n_fp[i] == len(fps), (k, w, i)
        exp = (
            int(fps.min() & np.uint64(0x7FFF_FFFF_FFFF_FFFF))
            if len(fps)
            else 0
        )
        assert fp_min[i] == exp, (k, w, i)


def test_ngram_jaccard_dup_bruteforce():
    """ngram_jaccard_dup == single-process brute force (string 3-gram
    shingles, df<=cap cut, exact Jaccard) at sf0.001 — independent of the
    DuckDB oracle; also pins the hashed-shingle == string-shingle parity."""
    import pyarrow.parquet as pq

    from graphminingtools_ray.pipelines.text_q import ngram_jaccard_dup

    sf = "/root/testdata/sf0.001"
    threshold, df_max = 0.3, 64
    got = ngram_jaccard_dup(sf, threshold=threshold, df_max=df_max)

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    sh: dict[int, set] = {}
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (x or "").split()
        sh[int(d)] = {
            tuple(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    from collections import Counter

    df_counts = Counter(s for ss in sh.values() for s in ss)
    kept = {d: {s for s in ss if df_counts[s] <= df_max} for d, ss in sh.items()}
    expect = []
    ids = sorted(kept)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(kept[a] & kept[b])
            if inter == 0:
                continue
            union = len(kept[a]) + len(kept[b]) - inter
            j = inter / union
            if j >= threshold:
                expect.append((a, b, inter, len(kept[a]), len(kept[b]), j))
    got_t = [
        (int(r.doc_a), int(r.doc_b), int(r.n_inter), int(r.n_a),
         int(r.n_b), float(r.jaccard))
        for r in got.itertuples()
    ]
    assert got_t == sorted(expect)


def test_pii_counts_nonzero_parity():
    """PiiCounts on crafted payloads: hand counts AND a DuckDB cross-check
    of the same patterns (the sf docs carry no PII, so the gate row alone
    would only certify zeros — this pins the non-zero path and the
    Rust-regex/RE2 dialect parity)."""
    import duckdb
    import pyarrow as pa

    from graphminingtools_ray.stages.text import PiiCounts

    texts = [
        "contact a.b+c@x-y.co.uk or d@e.org via https://a.b/c?x=1 ip 10.0.0.1",
        "no hits here",
        "bare a@b.c and http:// do not count; 1.2.3.4 5.6.7.8 do",
        None,
    ]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = PiiCounts()(batch)
    assert out["n_emails"].to_pylist() == [2, 0, 0, 0]
    assert out["n_urls"].to_pylist() == [1, 0, 0, 0]
    assert out["n_ipv4"].to_pylist() == [1, 0, 2, 0]
    con = duckdb.connect()
    for name, pat in PiiCounts.PATTERNS.items():
        for i, t in enumerate(texts):
            want = con.execute(
                "SELECT length(regexp_extract_all(?, ?))", [t or "", pat]
            ).fetchone()[0]
            assert out[name][i].as_py() == want, (name, i)


def test_pii_scrub_nonzero_parity():
    """PiiScrub on crafted payloads: the scrubbed text and per-type counts
    match a DuckDB replay of the identical sequential regexp_replace chain
    (sf docs carry no PII, so the gate row alone would certify only the
    no-op path)."""
    import duckdb
    import pyarrow as pa

    from graphminingtools_ray.stages.text import PiiScrub

    texts = [
        "mail a.b+c@x-y.co.uk then https://a.b/c?x=1 then 10.0.0.1 done",
        "no hits here",
        # URL containing an email-shaped span: the email replace runs FIRST,
        # splitting the URL — order sensitivity is pinned here
        "see https://x.y/z?u=a@b.com and 1.2.3.4",
        "<EMAIL> already present; e@f.org",
        None,
    ]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = PiiScrub()(batch)
    assert out["n_emails"].to_pylist() == [1, 0, 1, 1, 0]
    scrubbed = out["text_scrubbed"].to_pylist()
    assert scrubbed[0] == "mail <EMAIL> then <URL> then <IP> done"
    # the email inside the URL is replaced first (n_emails counts it), then
    # the URL replace swallows the whole whitespace-free span incl. the
    # placeholder — pinned because the SQL chain behaves identically
    assert scrubbed[2] == "see <URL> and <IP>"
    con = duckdb.connect()
    for i, t in enumerate(texts):
        cur = t or ""
        for name, pat, rep in PiiScrub.REPLACEMENTS:
            n = con.execute(
                "SELECT length(regexp_extract_all(?, ?))", [cur, pat]
            ).fetchone()[0]
            assert out[name][i].as_py() == n, (name, i)
            cur = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [cur, pat, rep]
            ).fetchone()[0]
        assert scrubbed[i] == cur, i


def test_bigram_logprob_micro(ray_session, tmp_path):
    """Bigram perplexity on a hand-checked corpus: add-one smoothing,
    continuation counts, document-order fold."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphminingtools_ray.pipelines.text_q import bigram_logprob

    docs = ["a b a b", "a b", "x"]
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    out = bigram_logprob(str(tmp_path))
    # vocabulary {a, b, x} -> V = 3; bigram counts: (a,b) x3, (b,a) x1;
    # c1: a-> 3, b-> 1. Doc "x" has no bigram and is absent.
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_bigrams"].tolist() == [3, 1]
    p_ab = math.log((3 + 1) / (3 + 3))
    p_ba = math.log((1 + 1) / (1 + 3))
    s0 = p_ab
    s0 = s0 + p_ba
    s0 = s0 + p_ab
    assert out["logprob_sum"].tolist() == [s0, p_ab]
    assert out["ppl"].tolist() == [math.exp(-s0 / 3), math.exp(-p_ab / 1)]


def test_substring_dup_spans_micro(ray_session, tmp_path):
    """Duplicated-k-gram span coverage on a hand-checked corpus: interval
    union of overlapping windows, short-doc single-window rule, and the
    multiplicity rule (a doc repeating itself counts)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphminingtools_ray.pipelines.text_q import substring_dup_spans

    k = 3
    docs = [
        "a b c d e f",      # windows: abc bcd cde def (pos 0..3)
        "a b c d x y",      # shares abc bcd with doc 0
        "p q",              # short: ONE window over 2 tokens, unique
        "r s t r s t r s t",  # self-repeating: rst str trs all dup'd
        "",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    out = substring_dup_spans(str(tmp_path), k=k).set_index("doc_id")
    # doc 0: dup windows at pos 0,1 (abc, bcd) -> union covers tokens 0..3
    assert out.loc[0, "n_windows"] == 4
    assert out.loc[0, "n_dup_windows"] == 2
    assert out.loc[0, "n_dup_tokens"] == 4  # min(3,1) + 3
    # doc 2: one short window, no duplicate anywhere
    assert out.loc[2, "n_windows"] == 1
    assert out.loc[2, "n_dup_windows"] == 0
    assert out.loc[2, "n_dup_tokens"] == 0
    # doc 3: 7 windows; every 3-gram occurs >= 2 times within the doc ->
    # all windows dup'd, union covers all 9 tokens
    assert out.loc[3, "n_windows"] == 7
    assert out.loc[3, "n_dup_windows"] == 7
    assert out.loc[3, "n_dup_tokens"] == 9
    # empty doc present with zeros
    assert out.loc[4, "n_windows"] == 0 and out.loc[4, "n_dup_tokens"] == 0


def test_corpus_kl_drift_micro(ray_session, tmp_path):
    """KL drift on a hand-checked 2-source corpus: add-one smoothing over
    the FULL vocabulary (absent words contribute) and the fold order."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphminingtools_ray.pipelines.text_q import corpus_kl_drift

    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a a b", "b c"], pa.string()),
            "source": pa.array(["s1", "s2"], pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    out = corpus_kl_drift(str(tmp_path)).set_index("source")
    V, n = 3, 5
    glob = {"a": 2, "b": 2, "c": 1}

    def kl(counts, ns):
        acc, first = 0.0, True
        for w in sorted(glob):  # token-ascending fold
            p = (counts.get(w, 0) + 1) / (ns + V)
            q = (glob[w] + 1) / (n + V)
            v = p * math.log(p / q)
            acc = v if first else acc + v
            first = False
        return acc

    assert out.loc["s1", "n_tokens"] == 3
    assert out.loc["s2", "n_tokens"] == 2
    assert out.loc["s1", "kl"] == kl({"a": 2, "b": 1}, 3)
    assert out.loc["s2", "kl"] == kl({"b": 1, "c": 1}, 2)


def test_bpe_train_bruteforce(ray_session, tmp_path):
    """BPE induction == a from-scratch brute-force reimplementation
    (recount all pairs every round; max count, tie -> lexicographically
    smallest pair; greedy leftmost re-segmentation)."""
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphminingtools_ray.pipelines.text_q import bpe_train

    docs = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low new wide w i d e",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    got = bpe_train(str(tmp_path), n_merges=12)

    # brute force
    freq = Counter(w for d in docs for w in d.split())
    words = {tuple(w) + ("</w>",): c for w, c in freq.items()}
    expect = []
    for rank in range(12):
        pc = Counter()
        for w, c in words.items():
            for a, b in zip(w, w[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        expect.append((rank, best[0], best[1], pc[best]))
        nxt = {}
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            nxt[nw] = nxt.get(nw, 0) + c
        words = nxt
    assert [tuple(r) for r in got.itertuples(index=False)] == expect
    assert got["freq"].iloc[0] >= got["freq"].iloc[-1]  # sanity: nonincreasing-ish
