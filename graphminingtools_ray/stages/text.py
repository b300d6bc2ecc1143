"""Text-analysis stages for a training-data pipeline: token stats, language
ID (n-gram/stopword heuristic), quality scoring.

All are callable CLASSES for ``map_batches(Cls, concurrency=N)`` actor pools:
regexes/tables built once per actor in ``__init__``, vectorized pandas/numpy
work per batch in ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para"},
    "de": {"der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit", "ein", "auf"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "dans", "que", "pour", "sur", "au"},
}


def _pl_utf8(texts):
    """polars Utf8 series from a pandas Series, Python list, or Arrow
    (chunked) string array. The Arrow path enters polars zero-copy — it
    skips materializing one Python ``str`` per doc, which is pure
    allocator/bandwidth churn on big batches. Results are content-determined,
    so every path is bit-identical."""
    import polars as pl
    import pyarrow as pa

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        return pl.from_arrow(arr.cast(pa.large_string())).fill_null("").rename("t")
    if isinstance(texts, pd.Series):
        texts = texts.fillna("")
    return pl.Series("t", list(texts), dtype=pl.Utf8).fill_null("")


class TextStats:
    """n_chars / n_tokens per document. Token rule = runs of non-whitespace
    (count of ``\\S+`` matches == ``len(text.strip().split())``) — matches
    the SQL oracle's ``string_split_regex(trim(text), '\\s+')``. One
    vectorized polars pass per Arrow batch (the ``count_matches`` idiom from
    pipelines.text_q.token_counts — no per-row Python)."""

    def __call__(self, batch):
        import pyarrow as pa

        s = _pl_utf8(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars_computed": s.str.len_chars()
                .to_numpy().astype(np.int64),
                "n_tokens": s.str.count_matches(r"\S+")
                .to_numpy().astype(np.int64),
            }
        )


class LangIdHeuristic:
    """Stopword-vote language ID: predicted lang = argmax over per-language
    stopword hit counts; 'unk' when no stopword hits at all. Deterministic;
    ties broken by language code order. Batch-vectorized: one polars
    tokenize/explode pass + an ``is_in`` per language over the flat tokens."""

    def __init__(self):
        from ..functions import asciitext as at

        self.langs = sorted(_STOPWORDS)
        self.tables = [sorted(_STOPWORDS[lang]) for lang in self.langs]
        self.token_re = r"[a-zA-ZÀ-ÿ]+"
        # one sorted union vocabulary + per-key language bitmask (stopword
        # lists overlap across languages — e.g. "de", "la"): a single
        # searchsorted over the token stream serves all languages
        key_bits: dict[int, int] = {}
        for li, t in enumerate(self.tables):
            for k in at.word_keys(t):
                key_bits[int(k)] = key_bits.get(int(k), 0) | (1 << li)
        self.uni_keys = np.array(sorted(key_bits), dtype=np.uint64)
        self.uni_bits = np.array(
            [key_bits[int(k)] for k in self.uni_keys], dtype=np.int64
        )

    def predict(self, texts) -> np.ndarray:
        """Predicted language codes (object array) for list / pandas / Arrow
        string input — the vectorized core, callable without a DataFrame.
        Pure-ASCII Arrow batches take the byte-table fast path (exact u64
        token matching — see functions/asciitext.py); anything else takes the
        polars/regex reference path. Both are bit-identical."""
        from ..functions import asciitext as at

        view = at.arrow_utf8_view(texts)
        if view is not None and at.is_ascii(*view):
            data, off = view
            D = len(off) - 1
            starts, lens, tok_doc, _ = at.token_runs(data, off, at.ALPHA_MASK)
            keys = at.lower_keys(at.pack_tokens_u64(data, starts, lens), lens)
            scores = np.zeros((D, len(self.langs)), dtype=np.int64)
            if len(keys):
                idx = np.minimum(
                    np.searchsorted(self.uni_keys, keys), len(self.uni_keys) - 1
                )
                hit_idx = np.flatnonzero(self.uni_keys[idx] == keys)
                bm = self.uni_bits[idx[hit_idx]]
                hit_doc = tok_doc[hit_idx]
                for li in range(len(self.langs)):
                    sel = (bm >> li) & 1 == 1
                    scores[:, li] = np.bincount(hit_doc[sel], minlength=D)
            best = scores.max(axis=1)
            arg = scores.argmax(axis=1)
            langs = np.asarray(self.langs, dtype=object)
            return np.where(best > 0, langs[arg], "unk")
        s = _pl_utf8(texts)
        toks = s.str.extract_all(self.token_re)
        counts = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls().str.to_lowercase()
        doc_of = np.repeat(np.arange(len(counts)), counts)
        scores = np.zeros((len(counts), len(self.langs)), dtype=np.int64)
        for li, table in enumerate(self.tables):
            hits = flat.is_in(table).to_numpy()
            np.add.at(scores[:, li], doc_of[hits], 1)
        best = scores.max(axis=1)
        arg = scores.argmax(axis=1)  # first max — ties by language order
        langs = np.asarray(self.langs, dtype=object)
        return np.where(best > 0, langs[arg], "unk")

    def __call__(self, batch):
        import pyarrow as pa

        from .dedup import batch_text

        preds = self.predict(batch_text(batch))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(preds.tolist(), pa.string()),
            }
        )


class QualityScore:
    """Composite document-quality heuristic in [0, 1]: favors moderate length,
    word-like tokens, low digit/punct density, some stopwords. The shape
    follows published quality-filter recipes (length + symbol ratios +
    stopword presence); exact weights are this engine's own."""

    def __init__(self):
        from ..functions import asciitext as at

        self.stop = sorted(_STOPWORDS["en"])
        self.stop_keys = at.word_keys(self.stop)

    def score(self, texts) -> np.ndarray:
        """Quality scores (float64) for list / pandas / Arrow string input.
        Batch-vectorized; pure-ASCII Arrow batches take the byte-table fast
        path (functions/asciitext.py — the regex class scans below run at
        ~75 MB/s/core, the byte tables at ~1 GB/s), everything else the
        polars reference path. Bit-identical: the float formula consumes the
        same integer counts either way. The regex classes ([0-9],
        [^0-9A-Za-zÀ-ÿ\\s]) mirror Python's per-char isdigit/isalnum/isspace
        on the Latin-1 range the corpora use."""
        from ..functions import asciitext as at

        view = at.arrow_utf8_view(texts)
        if view is not None and at.is_ascii(*view):
            data, off = view
            D = len(off) - 1
            cls = at.classify(data, off)
            n_chars = np.diff(off).astype(np.float64)  # ASCII: bytes == chars
            n_digits = at.class_doc_counts(cls, off, at.C_DIGIT).astype(np.float64)
            n_punct = at.class_doc_counts(cls, off, at.C_OTHER).astype(np.float64)
            n_tok_chars = n_chars - at.class_doc_counts(cls, off, at.C_WS)
            starts, lens, tok_doc, _ = at.token_runs(
                data, off, at.NONWS_MASK, cls=cls
            )
            n = np.bincount(tok_doc, minlength=D).astype(np.float64)
            keys = at.lower_keys(at.pack_tokens_u64(data, starts, lens), lens)
            hit = at.match_sorted(keys, self.stop_keys)
            n_stop = np.bincount(tok_doc[hit], minlength=D).astype(np.float64)
        else:
            s = _pl_utf8(texts)
            n_chars = s.str.len_chars().to_numpy().astype(np.float64)
            toks = s.str.extract_all(r"\S+")
            n = toks.list.len().to_numpy().astype(np.float64)
            # sum of token lengths == count of non-whitespace chars
            n_tok_chars = s.str.count_matches(r"\S").to_numpy().astype(np.float64)
            n_digits = s.str.count_matches(r"[0-9]").to_numpy().astype(np.float64)
            n_punct = (
                s.str.count_matches(r"[^0-9A-Za-zÀ-ÿ\s]")
                .to_numpy()
                .astype(np.float64)
            )
            flat = toks.explode().drop_nulls().str.to_lowercase()
            doc_of = np.repeat(np.arange(len(n)), n.astype(np.int64))
            n_stop = np.zeros(len(n), dtype=np.float64)
            hits = flat.is_in(self.stop).to_numpy()
            np.add.at(n_stop, doc_of[hits], 1.0)

        denom_chars = np.maximum(1.0, n_chars)
        nz = n > 0
        mean_len = np.divide(n_tok_chars, n, out=np.zeros_like(n), where=nz)
        digit_ratio = n_digits / denom_chars
        punct_ratio = n_punct / denom_chars
        stop_ratio = np.divide(n_stop, n, out=np.zeros_like(n), where=nz)
        score = np.minimum(1.0, n / 20.0)
        score *= np.where((mean_len >= 2.0) & (mean_len <= 12.0), 1.0, 0.5)
        score *= np.maximum(0.0, 1.0 - 3.0 * digit_ratio)
        score *= np.maximum(0.0, 1.0 - 3.0 * punct_ratio)
        score *= 0.5 + 0.5 * np.minimum(1.0, 4.0 * stop_ratio)
        score[~nz] = 0.0
        return score

    def __call__(self, batch):
        import pyarrow as pa

        from .dedup import batch_text

        return pa.table(
            {"doc_id": batch["doc_id"], "quality": self.score(batch_text(batch))}
        )


class GopherStats:
    """Gopher-style repetition / quality signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", table A1 repetition & quality filters) as
    INTEGER-EXACT per-document counts, so downstream ratio thresholds are a
    cheap projection and the DuckDB twin matches hash-exactly:

    - n_lines: '\\n'-split line count (empty text = 1 empty line),
    - n_bullet_lines / n_ellipsis_lines: lines whose ' \\t\\r'-trimmed form
      starts with '-' / '*' / '•' resp. ends with '...',
    - n_dup_lines: n_lines - count(DISTINCT raw lines),
    - n_words (\\S+ runs), n_alpha_words (words containing [A-Za-z]),
    - sum_word_len: Σ codepoint length of words,
    - n_symbols: '#' occurrences + non-overlapping '...' occurrences.

    One vectorized polars pass per Arrow batch (list eval over the split
    lines / extracted words — no per-row Python)."""

    def __call__(self, batch):
        import polars as pl
        import pyarrow as pa

        s = _pl_utf8(batch["text"])

        def i64(series):
            return series.to_numpy().astype(np.int64)

        lines = s.str.split("\n")
        trimmed = lines.list.eval(pl.element().str.strip_chars(" \t\r"))
        bullet = trimmed.list.eval(
            (
                pl.element().str.starts_with("-")
                | pl.element().str.starts_with("*")
                | pl.element().str.starts_with("•")
            ).cast(pl.Int64)
        ).list.sum()
        ellipsis = trimmed.list.eval(
            pl.element().str.ends_with("...").cast(pl.Int64)
        ).list.sum()
        words = s.str.extract_all(r"\S+")
        alpha = words.list.eval(
            pl.element().str.contains("[A-Za-z]").cast(pl.Int64)
        ).list.sum()
        wlen = words.list.eval(
            pl.element().str.len_chars().cast(pl.Int64)
        ).list.sum()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": i64(lines.list.len()),
                "n_bullet_lines": i64(bullet),
                "n_ellipsis_lines": i64(ellipsis),
                "n_dup_lines": i64(
                    lines.list.len() - lines.list.unique().list.len()
                ),
                "n_words": i64(words.list.len()),
                "n_alpha_words": i64(alpha.fill_null(0)),
                "sum_word_len": i64(wlen.fill_null(0)),
                "n_symbols": i64(
                    s.str.count_matches("#", literal=True)
                    + s.str.count_matches(r"\.\.\.")
                ),
            }
        )


class PiiScrub:
    """PII REDACTION — the deploy half of the scrubbing stage (PiiCounts is
    the detection half): replace every email / URL / IPv4 span with a typed
    placeholder and emit the scrubbed text plus per-type replacement counts.

    Replacements apply SEQUENTIALLY (emails, then URLs, then IPv4), each
    counting matches on the text as it stands at that stage — the order is
    part of the operator semantics and the SQL twin applies the identical
    nested ``regexp_replace(..., 'g')`` chain, so the scrubbed text column
    is hash-exact. Patterns are the PiiCounts set (Rust-regex/RE2 dialect
    parity). One vectorized polars pass per Arrow batch."""

    REPLACEMENTS = (
        ("n_emails",
         r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
        ("n_urls", r"https?://[^\s]+", "<URL>"),
        ("n_ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    )

    def __call__(self, batch):
        import pyarrow as pa

        from .dedup import batch_text

        s = _pl_utf8(batch_text(batch))
        cols = {"doc_id": batch["doc_id"]}
        counts = {}
        for name, pat, rep in self.REPLACEMENTS:
            counts[name] = s.str.count_matches(pat).to_numpy().astype(np.int64)
            s = s.str.replace_all(pat, rep)
        cols["text_scrubbed"] = s.to_arrow().cast(pa.string())
        cols.update(counts)
        return pa.table(cols)


class PiiCounts:
    """PII / scrub-signal pattern counts per document (the detection half of
    a scrubbing stage; redaction is a projection over these spans): emails,
    URLs, IPv4 literals — integer-exact counts from one vectorized polars
    pass. Pattern dialect chosen for Rust-regex/RE2 parity (oracle-verified,
    same approach as token_counts)."""

    PATTERNS = {
        "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "n_urls": r"https?://[^\s]+",
        "n_ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    }

    def __call__(self, batch):
        import pyarrow as pa

        s = _pl_utf8(batch["text"])
        cols = {"doc_id": batch["doc_id"]}
        for name, pat in self.PATTERNS.items():
            cols[name] = s.str.count_matches(pat).to_numpy().astype(np.int64)
        return pa.table(cols)
