"""Document-table pipelines: dedup family, text analysis, media plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..functions.rounding import round_half_away
from ..sources.tables import read_table
from ..stages.dedup import ExactDedupKey, MinHasher, SimHasher, WinnowFingerprint, jaccard
from ..stages.media import MediaFeatureStub
from ..stages.text import LangIdHeuristic, QualityScore, TextStats


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    return read_table(sf_dir, "documents", columns=list(columns))


def dedup_exact(sf_dir: str):
    """Exact dedup: canonical key (md5 of text) → per-key keeper (min doc_id)
    + multiplicity. Hash-partition by key + vectorized per-bucket combine
    (SURVEY §2.7)."""
    from ..functions.bucketing import bucketed_group_combine

    keyed = _docs(sf_dir).map_batches(ExactDedupKey(), batch_format="pandas")

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"text_md5": t["text_md5"].to_pylist(), "doc_id": t["doc_id"].to_numpy()}
        )
        g = df.groupby("text_md5", sort=True)["doc_id"].agg(["min", "count"])
        return pa.table(
            {
                "text_md5": pa.array(g.index.tolist(), pa.string()),
                "keeper_doc_id": g["min"].to_numpy(np.int64),
                "n_copies": g["count"].to_numpy(np.int64),
            }
        )

    return bucketed_group_combine(keyed, ["text_md5"], combine)


def doc_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(TextStats(), batch_format="pandas")


def lang_distribution(sf_dir: str):
    return (
        read_table(sf_dir, "documents", columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
    )


def langid_predict(sf_dir: str):
    """Heuristic language ID — actor pool (stopword tables built per actor)."""
    return _docs(sf_dir).map_batches(
        LangIdHeuristic, batch_format="pandas", concurrency=2
    )


def quality_scores(sf_dir: str):
    out = _docs(sf_dir).map_batches(
        QualityScore, batch_format="pandas", concurrency=2
    ).to_pandas()
    out["quality"] = round_half_away(out["quality"], 6)
    return out


def word_freq_topk(sf_dir: str, k: int = 20):
    """Token frequency top-k: batch-local partial counts (combiner) →
    groupby(token).sum → deterministic (n desc, token asc) top-k."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in batch["text"].fillna(""):
            for tok in t.split():
                counts[tok] = counts.get(tok, 0) + 1
        return pd.DataFrame(
            {"token": list(counts), "partial": np.fromiter(counts.values(), np.int64)}
        )

    from ..functions.bucketing import bucketed_group_combine

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"token": t["token"].to_pylist(), "partial": t["partial"].to_numpy()}
        )
        g = df.groupby("token", sort=True)["partial"].sum()
        return pa.table(
            {
                "token": pa.array(g.index.tolist(), pa.string()),
                "n": g.to_numpy(np.int64),
            }
        )

    return (
        bucketed_group_combine(
            _docs(sf_dir, columns=("doc_id", "text")).map_batches(
                partial, batch_format="pandas"
            ),
            ["token"],
            combine,
        )
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def minhash_near_dup(sf_dir: str, threshold: float = 0.3):
    """MinHash+LSH near-dup: signature → band buckets → candidate pairs →
    exact Jaccard verify (guide pattern; reference analog minhashing.c).

    Returns (doc_a, doc_b, jaccard) for verified pairs. Deterministic."""
    docs = _docs(sf_dir)
    bands = docs.map_batches(MinHasher, batch_format="pandas", concurrency=2)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand_pdf = cand.to_pandas().drop_duplicates()
    if len(cand_pdf) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=np.float64)})
    # verify: fetch texts for candidate docs only (small side), exact jaccard
    need = set(cand_pdf["doc_a"]) | set(cand_pdf["doc_b"])
    texts = (
        docs.map_batches(
            lambda b: b[b["doc_id"].isin(need)], batch_format="pandas"
        )
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    out = []
    for r in cand_pdf.itertuples():
        j = jaccard(texts.loc[r.doc_a], texts.loc[r.doc_b])
        if j >= threshold:
            out.append((int(r.doc_a), int(r.doc_b), j))
    out.sort()
    return pd.DataFrame(
        {
            "doc_a": pd.Series([a for a, _, _ in out], dtype=np.int64),
            "doc_b": pd.Series([b for _, b, _ in out], dtype=np.int64),
            "jaccard": round_half_away([j for _, _, j in out], 4)
            if out
            else pd.Series([], dtype=np.float64),
        }
    )


def simhash_fingerprints(sf_dir: str):
    return _docs(sf_dir).map_batches(SimHasher, batch_format="pandas", concurrency=2)


def winnow_fingerprints(sf_dir: str):
    return _docs(sf_dir).map_batches(
        WinnowFingerprint, batch_format="pandas", concurrency=2
    )


def media_features(sf_dir: str):
    """Multimodal plumbing demo over an opaque binary payload column (the
    documents' text bytes stand in for image/audio payloads)."""

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(
                    [s.encode() for s in t["text"].to_pylist()], pa.binary()
                ),
            }
        )

    ds = _docs(sf_dir).map_batches(to_payload, batch_format="pyarrow")
    return ds.map_batches(
        MediaFeatureStub,
        fn_constructor_kwargs={"decoder": "stub"},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )
