"""Text-analysis stages for a training-data pipeline: token stats, language
ID (n-gram/stopword heuristic), quality scoring.

All are callable CLASSES for ``map_batches(Cls, concurrency=N)`` actor pools:
regexes/tables built once per actor in ``__init__``, vectorized pandas/numpy
work per batch in ``__call__``.
"""

from __future__ import annotations

import re

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
    stopword hit ratio; 'unk' when no stopword hits at all. Deterministic;
    ties broken by language code order."""

    def __init__(self):
        self.langs = sorted(_STOPWORDS)
        self.tables = [_STOPWORDS[lang] for lang in self.langs]
        self.token_re = re.compile(r"[a-zA-ZÀ-ÿ]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in batch["text"].fillna(""):
            toks = [t.lower() for t in self.token_re.findall(text)]
            if not toks:
                preds.append("unk")
                continue
            scores = [sum(t in tab for t in toks) for tab in self.tables]
            best = max(scores)
            preds.append(self.langs[scores.index(best)] if best > 0 else "unk")
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


class QualityScore:
    """Composite document-quality heuristic in [0, 1]: favors moderate length,
    word-like tokens, low digit/punct density, some stopwords. The shape
    follows published quality-filter recipes (length + symbol ratios +
    stopword presence); exact weights are this engine's own."""

    def __init__(self):
        self.stop = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scores = []
        for text in batch["text"].fillna(""):
            toks = text.split()
            n = len(toks)
            if n == 0:
                scores.append(0.0)
                continue
            mean_len = float(np.mean([len(t) for t in toks]))
            digit_ratio = sum(c.isdigit() for c in text) / max(1, len(text))
            punct_ratio = sum(not c.isalnum() and not c.isspace() for c in text) / max(
                1, len(text)
            )
            stop_ratio = sum(t.lower() in self.stop for t in toks) / n
            s = 1.0
            s *= min(1.0, n / 20.0)  # too short → low
            s *= 1.0 if 2.0 <= mean_len <= 12.0 else 0.5
            s *= max(0.0, 1.0 - 3.0 * digit_ratio)
            s *= max(0.0, 1.0 - 3.0 * punct_ratio)
            s *= 0.5 + 0.5 * min(1.0, 4.0 * stop_ratio)
            scores.append(float(s))
        return pd.DataFrame({"doc_id": batch["doc_id"], "quality": scores})
