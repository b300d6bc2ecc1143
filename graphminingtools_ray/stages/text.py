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


class TextStats:
    """n_chars / n_tokens per document. Token rule = runs of whitespace
    (``text.strip().split()``) — matches the SQL oracle's
    ``string_split_regex(trim(text), '\\s+')``."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars_computed": text.str.len().astype(np.int64),
                "n_tokens": text.str.strip().str.split().map(len).astype(np.int64),
            }
        )


class LangIdHeuristic:
    """Stopword-vote language ID: predicted lang = argmax over per-language
    stopword hit counts; 'unk' when no stopword hits at all. Deterministic;
    ties broken by language code order. Batch-vectorized: one polars
    tokenize/explode pass + an ``is_in`` per language over the flat tokens."""

    def __init__(self):
        self.langs = sorted(_STOPWORDS)
        self.tables = [sorted(_STOPWORDS[lang]) for lang in self.langs]
        self.token_re = r"[a-zA-ZÀ-ÿ]+"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        s = pl.Series("t", batch["text"].fillna("").tolist(), dtype=pl.Utf8)
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
        preds = np.where(best > 0, langs[arg], "unk")
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


class QualityScore:
    """Composite document-quality heuristic in [0, 1]: favors moderate length,
    word-like tokens, low digit/punct density, some stopwords. The shape
    follows published quality-filter recipes (length + symbol ratios +
    stopword presence); exact weights are this engine's own."""

    def __init__(self):
        self.stop = sorted(_STOPWORDS["en"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Batch-vectorized via polars character-class counts. The regex
        classes ([0-9], [^0-9A-Za-zÀ-ÿ\\s]) mirror Python's per-char
        isdigit/isalnum/isspace on the Latin-1 range the corpora use."""
        import polars as pl

        s = pl.Series("t", batch["text"].fillna("").tolist(), dtype=pl.Utf8)
        n_chars = s.str.len_chars().to_numpy().astype(np.float64)
        toks = s.str.extract_all(r"\S+")
        n = toks.list.len().to_numpy().astype(np.float64)
        # sum of token lengths == count of non-whitespace chars
        n_tok_chars = s.str.count_matches(r"\S").to_numpy().astype(np.float64)
        n_digits = s.str.count_matches(r"[0-9]").to_numpy().astype(np.float64)
        n_punct = (
            s.str.count_matches(r"[^0-9A-Za-zÀ-ÿ\s]").to_numpy().astype(np.float64)
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
        return pd.DataFrame({"doc_id": batch["doc_id"], "quality": score})
