"""Document-table pipelines: dedup family, text analysis, media plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count

from ..context import actor_pool
from ..functions.rounding import round_half_away
from ..sources.tables import read_table
from ..stages.dedup import ExactDedupKey, MinHasher, SimHasher, WinnowFingerprint
from ..stages.media import MediaFeatureStub
from ..stages.text import LangIdHeuristic, QualityScore, TextStats


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    return read_table(sf_dir, "documents", columns=list(columns))


def dedup_exact(sf_dir: str):
    """Exact dedup: canonical key (md5 of text) → per-key keeper (min doc_id)
    + multiplicity. Hash-partition by key + vectorized per-bucket combine
    (SURVEY §2.7)."""
    from ..functions.bucketing import bucketed_group_combine

    keyed = _docs(sf_dir).map_batches(ExactDedupKey(), batch_format="pyarrow")

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
    return _docs(sf_dir).map_batches(TextStats(), batch_format="pyarrow")


def lang_distribution(sf_dir: str):
    return (
        read_table(sf_dir, "documents", columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
    )


def langid_predict(sf_dir: str):
    """Heuristic language ID — actor pool (stopword tables built per actor)."""
    return _docs(sf_dir).map_batches(
        LangIdHeuristic, batch_format="pyarrow", concurrency=actor_pool()
    )


def quality_scores(sf_dir: str):
    out = _docs(sf_dir).map_batches(
        QualityScore, batch_format="pyarrow", concurrency=actor_pool()
    ).to_pandas()
    out["quality"] = round_half_away(out["quality"], 6)
    return out


def word_freq_topk(sf_dir: str, k: int = 20):
    """Token frequency top-k: batch-local partial counts (combiner) →
    groupby(token).sum → deterministic (n desc, token asc) top-k."""

    def partial(batch: pa.Table) -> pa.Table:
        # vectorized batch-local combiner: one polars split/explode/
        # value_counts pass (no per-token Python loop); Arrow in, Arrow out
        from ..stages.text import _pl_utf8

        toks = (
            _pl_utf8(batch["text"])
            .str.extract_all(r"\S+")
            .explode()
            .drop_nulls()
        )
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "partial": pa.array([], pa.int64())}
            )
        vc = toks.value_counts()
        return pa.table(
            {
                "token": vc["t"].to_arrow().cast(pa.string()),
                "partial": vc["count"].to_numpy().astype(np.int64),
            }
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
                partial, batch_format="pyarrow"
            ),
            ["token"],
            combine,
        )
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def minhash_near_dup(sf_dir: str, threshold: float = 0.3, bucket_cap: int = 256,
                     num_parts: int = 32, family: str = "v2"):
    """MinHash+LSH near-dup: signature → band buckets → candidate pairs →
    exact Jaccard verify (guide pattern; reference analog minhashing.c).

    FULLY DISTRIBUTED (no driver-side candidate set), with the shingle
    payload crossing the wire exactly ONCE (the partitioned-probe-index
    pattern also used by the triangle closing-edge probe):
      0. ONE scan of the docs computes each doc's sorted-unique shingle set;
         MinHash signatures are derived FROM the sets (min over a set ==
         min over the raw shingle stream, bit-identical), so text is
         tokenized/hashed exactly once;
      1. ONE heavy exchange partitions the shingle sets by part(doc_id)
         into P state rows ((ids, off, flat) CSR layout, 64-bit offsets)
         pinned in the object store; the driver holds {part: block_ref}
         only. P scales with the corpus, so a state row stays node-sized;
      2. band rows derived from the state rows → bucketed exchange on
         (band_id, band_hash) → vectorized per-bucket pair expansion
         (``bucket_cap`` bounds the quadratic blowup of a degenerate
         all-identical LSH bucket: sorted doc ids, first ``bucket_cap``
         kept — deterministic truncation semantics);
      3. ONE pair-scale exchange keyed part(doc_a): global pair dedup in
         the bucket (every (a, *) pair of a doc lands in its partition's
         bucket), shingle sets for both sides fetched zero-copy from the
         state index, exact-Jaccard verify + threshold filter in place.
    Only the verified survivors (tiny) reach the driver. Deterministic.

    ``family`` selects the base-hash family: "v2" (default, polars-hash —
    the tuned scale path) or "md5" (stages/dedup_md5.py: md5_number_lower
    base hash, md5-derived permutations, candidate groups keyed on the
    EXACT per-band signature words, zero-shingle docs excluded, and
    exact-integer (n_inter, n_union) output — every stage value-replicable
    in DuckDB, which is what flips this operator to a full driver-gate row).
    Same distributed plan either way.

    Returns (doc_a, doc_b, jaccard) for verified pairs, sorted — or
    (doc_a, doc_b, n_inter, n_union) for the md5 family."""
    return minhash_near_dup_docs(
        _docs(sf_dir), threshold=threshold, bucket_cap=bucket_cap,
        num_parts=num_parts, family=family,
    )


def minhash_near_dup_docs(
    docs, threshold: float = 0.3, bucket_cap: int = 256,
    num_parts: int = 32, family: str = "v2",
):
    """Dataset-level core of ``minhash_near_dup`` (same plan, same
    docstring): ``docs`` is any Dataset with (doc_id int64, text string) —
    lets benchmarks/pipelines dedup arbitrary corpora, not just the sf
    documents table."""
    from ..algos.partitioned import PartCache, index_state
    from ..functions.bucketing import (
        bucketed_group_combine,
        int_bucket,
        partition_group_combine,
    )
    from ..graph.build import _pairs_from_sorted_key_items
    from ..stages.dedup import (
        jaccard_counts_sorted_sets,
        jaccard_sorted_sets,
        shingle_sets_batch,
    )

    md5 = family == "md5"
    if md5:
        from ..stages.dedup_md5 import MinHasherMD5, shingle_sets_md5_batch

        sets_fn, hasher = shingle_sets_md5_batch, MinHasherMD5()
    else:
        sets_fn, hasher = shingle_sets_batch, MinHasher()

    P = num_parts
    SH_T = pa.large_list(pa.uint64())

    def shingle_rows(t: pa.Table) -> pa.Table:
        # Arrow path into the shingle hasher: zero-copy into polars, no
        # per-doc Python str materialization (bit-identical hash family)
        sets = sets_fn(pa.compute.fill_null(t["text"], ""))
        doc_ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "part": int_bucket(doc_ids, P),
                "doc_id": doc_ids,
                "sh": pa.array(sets, SH_T),
            }
        )

    def build_state(t: pa.Table) -> pa.Table:
        part = int(t["part"][0].as_py())
        ids = t["doc_id"].to_numpy()
        sh = t["sh"].combine_chunks() if isinstance(t["sh"], pa.ChunkedArray) else t["sh"]
        flat = sh.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        off = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(off)
        order = np.argsort(ids, kind="stable")  # doc ids are unique
        cnts = counts[order]
        starts = off[:-1][order]
        new_off = np.concatenate([[0], np.cumsum(cnts)])
        src = np.repeat(starts - new_off[:-1], cnts) + np.arange(new_off[-1])
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "ids": pa.array([ids[order]], pa.list_(pa.int64())),
                "off": pa.array([new_off], pa.list_(pa.int64())),
                "flat": pa.array([flat[src]], SH_T),
            }
        )

    # ONE exchange moves the shingle payload; the state rows are reused by
    # the band stage AND the verify stage (zero-copy object-store reads)
    state_ds = partition_group_combine(
        docs.map_batches(shingle_rows, batch_format="pyarrow"),
        "part", P, build_state,
    ).materialize()
    state_index, _ = index_state(state_ds, [])
    state_index_ref = ray.put(state_index)

    sig_cols = [f"s_{j}" for j in range(hasher.rows)] if md5 else []

    def band_rows(t: pa.Table) -> pa.Table:
        out = []
        nb = hasher.bands
        for row in range(t.num_rows):
            ids = t["ids"][row].values.to_numpy(zero_copy_only=False)
            off = t["off"][row].values.to_numpy(zero_copy_only=False)
            flat = t["flat"][row].values.to_numpy(zero_copy_only=False).astype(np.uint64)
            sigs = hasher.signatures_from_flat(flat, off)
            if md5:
                # zero-shingle docs carry no content signal — excluded so
                # the SQL twin (where they simply have no shingle rows)
                # matches without an empty-doc special case
                keep = np.diff(off) > 0
                ids, sigs = ids[keep], sigs[keep]
            bh = hasher.band_hashes(sigs)
            cols = {
                "doc_id": np.repeat(ids, nb),
                "band_id": np.tile(np.arange(nb, dtype=np.int64), len(ids)),
                "band_hash": bh.ravel(),
            }
            if md5:
                # exact per-band signature words ride along: candidate
                # groups key on THEM (collision-free), band_hash only routes
                chunked = sigs.reshape(len(sigs), hasher.bands, hasher.rows)
                for j, c in enumerate(sig_cols):
                    cols[c] = chunked[:, :, j].ravel()
            out.append(pa.table(cols))
        if not out:
            empty = {
                "doc_id": np.empty(0, np.int64), "band_id": np.empty(0, np.int64),
                "band_hash": np.empty(0, np.int64),
            }
            for c in sig_cols:
                empty[c] = np.empty(0, np.uint64)
            return pa.table(empty)
        return pa.concat_tables(out)

    bands = state_ds.map_batches(band_rows, batch_format="pyarrow", batch_size=1)

    def pair_gen(t: pa.Table) -> pa.Table:
        key_cols = [t["band_id"].to_numpy().astype(np.uint64)]
        if md5:
            key_cols += [t[c].to_numpy().astype(np.uint64) for c in sig_cols]
        else:
            key_cols.append(t["band_hash"].to_numpy().astype(np.uint64))
        packed = np.stack(key_cols, axis=1)
        _, inv = np.unique(packed, axis=0, return_inverse=True)
        d = t["doc_id"].to_numpy()
        order = np.lexsort((d, inv))
        a, b = _pairs_from_sorted_key_items(inv[order], d[order], bucket_cap)
        if len(a) == 0:
            return pa.table(
                {"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64)}
            )
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)  # bucket-local dedup
        return pa.table({"doc_a": uniq[:, 0], "doc_b": uniq[:, 1]})

    cand = bucketed_group_combine(bands, ["band_id", "band_hash"], pair_gen)

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(int_bucket(t["doc_a"].to_numpy(), P))
        )

    def verify(t: pa.Table) -> pa.Table:
        cache = PartCache(ray.get(state_index_ref), ["ids", "off", "flat"])
        # global pair dedup: part is a function of doc_a, so every (a, *)
        # pair of a doc lands in this one bucket
        pk = np.stack([t["doc_a"].to_numpy(), t["doc_b"].to_numpy()], axis=1)
        uniqp = np.unique(pk, axis=0)
        ka, kb = uniqp[:, 0], uniqp[:, 1]

        def fetch(doc_ids: np.ndarray) -> list:
            out: list = [None] * len(doc_ids)
            parts = int_bucket(doc_ids, P)
            for p in np.unique(parts):
                ids_p, off_p, flat_p = cache.get(int(p))
                m = np.flatnonzero(parts == p)
                pos = np.searchsorted(ids_p, doc_ids[m])
                for i, q in zip(m, pos):
                    out[i] = flat_p[off_p[q]: off_p[q + 1]]
            return out

        sets_a, sets_b = fetch(ka), fetch(kb)
        if md5:
            # exact-integer output (a float ratio would re-open rounding-ulp
            # questions the driver gate hashes on); same IEEE comparison as
            # the SQL twin's CAST(n_inter AS DOUBLE) / n_union >= t
            inter, union = jaccard_counts_sorted_sets(sets_a, sets_b)
            m = (inter / np.maximum(1, union)) >= threshold
            return pa.table(
                {"doc_a": ka[m], "doc_b": kb[m],
                 "n_inter": inter[m], "n_union": union[m]}
            )
        jac = jaccard_sorted_sets(sets_a, sets_b)
        m = jac >= threshold
        return pa.table({"doc_a": ka[m], "doc_b": kb[m], "jaccard": jac[m]})

    verified = partition_group_combine(
        cand.map_batches(add_part, batch_format="pyarrow"), "part", P, verify
    )
    out = verified.to_pandas()
    if len(out) == 0:
        empty = {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64)}
        if md5:
            empty["n_inter"] = pd.Series([], dtype=np.int64)
            empty["n_union"] = pd.Series([], dtype=np.int64)
        else:
            empty["jaccard"] = pd.Series([], dtype=np.float64)
        return pd.DataFrame(empty)
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    out["doc_a"] = out["doc_a"].astype(np.int64)
    out["doc_b"] = out["doc_b"].astype(np.int64)
    if md5:
        out["n_inter"] = out["n_inter"].astype(np.int64)
        out["n_union"] = out["n_union"].astype(np.int64)
    else:
        out["jaccard"] = round_half_away(out["jaccard"], 4)
    return out


def simhash_fingerprints(sf_dir: str):
    return _docs(sf_dir).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=actor_pool()
    )


def winnow_fingerprints(sf_dir: str):
    return _docs(sf_dir).map_batches(
        WinnowFingerprint, batch_format="pyarrow", concurrency=actor_pool()
    )


def simhash_md5(sf_dir: str):
    """SQL-oracled SimHash twin (stages/dedup_md5.py): per-token
    md5_number_lower votes, low-63-bit fingerprint."""
    from ..stages.dedup_md5 import SimHashMD5Stage

    return _docs(sf_dir).map_batches(
        SimHashMD5Stage, batch_format="pyarrow", concurrency=actor_pool()
    )


def winnow_md5(sf_dir: str):
    """SQL-oracled winnowing twin: md5 word-5-gram shingle hashes, window-4
    minima, per-doc (n_fingerprints, fp_min & (2^63-1))."""
    from ..stages.dedup_md5 import WinnowMD5Stage

    return _docs(sf_dir).map_batches(
        WinnowMD5Stage, batch_format="pyarrow", concurrency=actor_pool()
    )


def minhash_sketches_md5(sf_dir: str):
    """SQL-oracled MinHash sketch twin: 32 md5-derived permutations over md5
    word-3-gram shingle sets; (doc_id, perm, minhash) with minhash the
    two's-complement int64 view of the uint64 word. Zero-shingle docs are
    excluded (they have no sketch)."""
    from ..stages.dedup_md5 import MinHasherMD5, shingle_sets_md5_batch

    hasher = MinHasherMD5()

    def sketch_rows(t: pa.Table) -> pa.Table:
        sets = shingle_sets_md5_batch(pa.compute.fill_null(t["text"], ""))
        doc_ids = t["doc_id"].to_numpy()
        keep = np.array([len(s) > 0 for s in sets], bool)
        sets = [s for s in sets if len(s)]
        sigs = hasher.signatures_from_sets(sets)
        return pa.table(
            {
                "doc_id": np.repeat(doc_ids[keep], hasher.num_perm),
                "perm": np.tile(
                    np.arange(hasher.num_perm, dtype=np.int64), len(sets)
                ),
                "minhash": sigs.view(np.int64).ravel(),
            }
        )

    return _docs(sf_dir).map_batches(sketch_rows, batch_format="pyarrow")


def minhash_lsh_md5(sf_dir: str):
    """SQL-oracled MinHash+LSH near-dup twin — the full pipeline
    (shingle → sketch → band → candidate → exact-Jaccard verify) on the
    md5 base-hash family; see :func:`minhash_near_dup` (family="md5")."""
    return minhash_near_dup(sf_dir, threshold=0.3, family="md5")


def dedup_clusters_md5(sf_dir: str, threshold: float = 0.3):
    """Fuzzy-dedup CLUSTERS — the canonical training-data product the pair
    list feeds: connected components over the verified near-dup pair graph,
    keeper = min doc_id per cluster (what a dedup pass keeps; everything
    else in the cluster is the drop set). Composes two certified pieces:
    the SQL-oracled md5 LSH pair pipeline and the superstep
    connected-components operator (``algos.components`` — the same 2D-grid
    substrate the 512M-edge bench graph runs on, so the cluster step
    scales to pair graphs that dwarf memory). Returns (doc_id, keeper) for
    every doc appearing in ≥1 verified pair."""
    import ray.data as _rd

    from ..algos.components import connected_components
    from ..graph.build import symmetrize

    pairs = minhash_near_dup(sf_dir, threshold=threshold, family="md5")
    if len(pairs) == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "keeper": pd.Series([], dtype=np.int64)}
        )
    edges = _rd.from_arrow(
        pa.table(
            {"src": pairs["doc_a"].to_numpy(np.int64),
             "dst": pairs["doc_b"].to_numpy(np.int64)}
        )
    )
    ids, comp, _info = connected_components(symmetrize(edges))
    return pd.DataFrame({"doc_id": ids, "keeper": comp.astype(np.int64)})


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
        concurrency=actor_pool(),
    )


def dedup_keep_best(sf_dir: str, threshold: float = 0.3):
    """END-TO-END dedup policy: fuzzy-dedup clusters (md5 LSH pairs →
    superstep connected components) + QUALITY-BASED canonical selection —
    per cluster keep the highest-quality document (tie → min doc_id),
    the standard "which duplicate survives" rule of a training-data pass
    (vs ``dedup_clusters_md5``'s min-id keeper). Quality is computed ONLY
    for clustered docs (the near-dup set is a small fraction of the
    corpus; its ids broadcast once and the corpus streams through a
    membership filter). Returns (cluster, best_doc, quality)."""
    import ray as _ray

    from ..stages.text import QualityScore

    clusters = dedup_clusters_md5(sf_dir, threshold=threshold)
    if len(clusters) == 0:
        return pd.DataFrame(
            {"cluster": pd.Series([], dtype=np.int64),
             "best_doc": pd.Series([], dtype=np.int64),
             "quality": pd.Series([], dtype=np.float64)}
        )
    want_ref = _ray.put(set(int(d) for d in clusters["doc_id"]))

    def member(t: pa.Table) -> pa.Table:
        want = _ray.get(want_ref)
        ids = t["doc_id"].to_numpy()
        m = np.fromiter((int(i) in want for i in ids), bool, count=len(ids))
        return t.filter(pa.array(m))

    qual = (
        _docs(sf_dir)
        .map_batches(member, batch_format="pyarrow")
        .map_batches(QualityScore, batch_format="pyarrow",
                     concurrency=actor_pool())
        .to_pandas()
    )
    qual["quality"] = round_half_away(qual["quality"], 6)
    j = clusters.merge(qual, on="doc_id")
    j = j.sort_values(
        ["keeper", "quality", "doc_id"], ascending=[True, False, True]
    )
    best = j.groupby("keeper", sort=True).head(1)
    return pd.DataFrame(
        {
            "cluster": best["keeper"].to_numpy(np.int64),
            "best_doc": best["doc_id"].to_numpy(np.int64),
            "quality": best["quality"].to_numpy(np.float64),
        }
    ).reset_index(drop=True)


def gopher_stats(sf_dir: str):
    """Gopher-style repetition / quality signals per document (Rae et al.
    2021 filter family) as integer-exact counts — line stats (bullet /
    ellipsis / duplicate lines), word stats (alpha fraction numerators,
    codepoint lengths), symbol counts. One vectorized polars pass
    (stages.text.GopherStats); SQL-oracled hash-exact."""
    from ..stages.text import GopherStats

    return _docs(sf_dir).map_batches(
        GopherStats,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=actor_pool(),
    )


def pii_counts(sf_dir: str):
    """PII / scrub-signal pattern counts per document (emails, URLs, IPv4) —
    integer-exact, one vectorized polars pass (stages.text.PiiCounts);
    SQL-oracled hash-exact (Rust-regex/RE2 dialect parity)."""
    from ..stages.text import PiiCounts

    return _docs(sf_dir).map_batches(
        PiiCounts,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=actor_pool(),
    )


def pii_scrub(sf_dir: str):
    """PII redaction per document: emails / URLs / IPv4 literals replaced by
    typed placeholders (sequentially, in that order), plus per-type
    replacement counts — the deploy half of the scrubbing stage
    (stages.text.PiiScrub). Hash-exact vs a nested regexp_replace SQL twin."""
    from ..stages.text import PiiScrub

    return _docs(sf_dir).map_batches(
        PiiScrub,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=actor_pool(),
    )


def media_features_real(sf_dir: str):
    """REAL media decode end to end: one deterministic closed-form payload
    per document id (PPM / 24-bit BMP / PCM WAV round-robin —
    ``stages.media.synth_media_payload``), parsed by the dependency-free
    format decoders into integer-exact features (kind, dimensions, channels,
    sample_rate, n_values, sum_values). Driver-gate checkable: the DuckDB
    twin recomputes every feature symbolically from the same closed form, so
    a hash match certifies the binary PARSERS against real bytes."""
    from ..stages.media import MediaDecode, synth_media_payload

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(
                    [synth_media_payload(i) for i in ids], pa.binary()
                ),
            }
        )

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        to_payload, batch_format="pyarrow"
    )
    return ds.map_batches(
        MediaDecode,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=actor_pool(),
    )


def media_features_jpeg(sf_dir: str):
    """REAL baseline-JPEG decode end to end: one deterministic DC-only
    grayscale JPEG per document id (``stages.jpeg.synth_jpeg_payload`` —
    real Huffman-coded compressed bytes), parsed by the dependency-free
    T.81 decoder into integer-exact features. The DuckDB twin recomputes
    width/height/sums from the fixtures' closed form, so a hash match
    certifies the Huffman + dequant + IDCT pipeline against real bytes."""
    from ..stages.jpeg import synth_jpeg_payload
    from ..stages.media import MediaDecode

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(
                    [synth_jpeg_payload(i) for i in ids], pa.binary()
                ),
            }
        )

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        to_payload, batch_format="pyarrow"
    )
    return ds.map_batches(
        MediaDecode,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=actor_pool(),
    )


def media_features_png(sf_dir: str):
    """REAL PNG decode end to end: one deterministic RGB PNG per document
    id (``stages.png.synth_png_payload`` — real zlib-compressed bytes with
    row filters cycling through all five types), parsed by the
    dependency-free decoder (stdlib zlib + numpy filter reconstruction)
    into integer-exact features. The DuckDB twin recomputes the pixel sum
    from the fixtures' closed form, so a hash match certifies chunk
    walking, CRCs, DEFLATE handling and every filter's reconstruction."""
    from ..stages.media import MediaDecode
    from ..stages.png import synth_png_payload

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(
                    [synth_png_payload(i) for i in ids], pa.binary()
                ),
            }
        )

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        to_payload, batch_format="pyarrow"
    )
    return ds.map_batches(
        MediaDecode,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=actor_pool(),
    )


def media_features_gif(sf_dir: str):
    """REAL GIF decode end to end: one deterministic LZW-compressed GIF per
    document id (``stages.gif.synth_gif_payload`` — every third id
    interlaced; the sum is interlace-invariant, so the pixel-exact
    de-interlace oracle lives in pytest), parsed by the dependency-free
    decoder into integer-exact palette-expanded features. The DuckDB twin
    recomputes the RGB sum from the fixtures' closed form, so a hash match
    certifies the LZW layer against real compressed bytes."""
    from ..stages.gif import synth_gif_payload
    from ..stages.media import MediaDecode

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(
                    [synth_gif_payload(i) for i in ids], pa.binary()
                ),
            }
        )

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        to_payload, batch_format="pyarrow"
    )
    return ds.map_batches(
        MediaDecode,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=actor_pool(),
    )


def media_gif_frames(sf_dir: str):
    """REAL frame sampling end to end — the video-style flat-map with an
    actual decoder: one deterministic ANIMATED GIF per document id
    (``stages.gif.synth_gif_animation_payload``, 1 + id%3 frames), each
    frame LZW-decoded to integer-exact per-frame features (rows multiply:
    one output row per frame). The DuckDB twin recomputes every frame's
    RGB sum from the closed form, so a hash match certifies multi-frame
    parsing + the LZW layer on animated files."""
    from ..stages.gif import synth_gif_animation_payload
    from ..stages.media import GifFrameFeatures

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(
                    [synth_gif_animation_payload(i) for i in ids],
                    pa.binary(),
                ),
            }
        )

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        to_payload, batch_format="pyarrow"
    )
    return ds.map_batches(
        GifFrameFeatures,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=actor_pool(),
    )


def media_frame_features(sf_dir: str):
    """Chained multimodal plumbing: payload → resize (size-class change) →
    frame sampling (flat-map: rows multiply) → per-frame features — three
    actor-pool ``map_batches`` stages over binary columns, the video-style
    shape of the media pipeline. Decoders are deterministic stubs (the real
    ones are gated ``NotImplementedError`` — imaging/ffmpeg libs absent by
    environment); the Ray-side schema/batching/flat-map plumbing is real.
    Rows-only (binary payloads are not a DuckDB-comparable value type);
    stage determinism + row-count contracts pinned in tests/test_media.py."""
    from ..stages.media import FrameSampleStub, MediaFeatureStub, MediaResizeStub

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(
                    [(s or "").encode() for s in t["text"].to_pylist()],
                    pa.binary(),
                ),
            }
        )

    ds = _docs(sf_dir).map_batches(to_payload, batch_format="pyarrow")
    resized = ds.map_batches(
        MediaResizeStub, batch_format="pyarrow", batch_size=256,
        concurrency=actor_pool(),
    )
    frames = resized.map_batches(
        FrameSampleStub, batch_format="pyarrow", batch_size=256,
        concurrency=actor_pool(),
    )
    return frames.map_batches(
        MediaFeatureStub,
        fn_constructor_kwargs={
            "id_col": "media_id",
            "payload_col": "frame",
            "passthrough_cols": ("frame_index",),
        },
        batch_format="pyarrow", batch_size=1024, concurrency=actor_pool(),
    )


def ngram_jaccard_dup(
    sf_dir: str, threshold: float = 0.5, df_max: int = 64, as_pandas: bool = True
):
    """EXACT n-gram-Jaccard near-duplicate pairs (the non-probabilistic twin
    of ``minhash_near_dup``) over the document-frequency-capped shingle
    space: word-3-gram shingles appearing in more than ``df_max`` documents
    are dropped globally (the standard stopword-shingle cut — at corpus
    scale a ubiquitous shingle contributes O(df²) pairs and no signal), then
    every pair sharing ≥1 kept shingle gets its exact Jaccard
    |A∩B| / (|A|+|B|−|A∩B|) over the kept space and survives iff
    ≥ ``threshold``. The cap is part of the OPERATOR SEMANTICS and is
    applied identically in the SQL oracle, so results match exactly (shingle
    hashes are 64-bit; parity with string shingles assumes no collision —
    astronomically safe and asserted by the oracle at test scale).

    Scale note: exchange 1 moves the (shingle, doc) long table — token-scale
    bytes, the EXACT operator's inherent floor (every distinct shingle
    occurrence must meet its global document frequency once). The df cap
    bounds the pair side; when token-scale exchange is too much,
    ``minhash_near_dup`` is the sub-linear sketch path over the same
    shingle space.

    Four bucketed exchanges, never all-pairs, nothing driver-scale:
      1. keyed on shingle: global df per shingle lives in one bucket → df
         cut, per-shingle doc pairs (a<b) partial-counted, per-doc
         kept-shingle-count partials; one tagged stream (size rows have
         doc_b = −1; assumes doc_id ≥ 0).
      2. keyed on (doc_a, doc_b): exact int sums → |A∩B| and |A|.
      3. keyed on doc_a: attach n_a to pairs; size rows ride along.
      4. keyed on doc_b: attach n_b, Jaccard + threshold inside the bucket.

    Returns (doc_a, doc_b, n_inter, n_a, n_b, jaccard) sorted."""
    from ..functions.bucketing import (
        bucketed_group_combine,
        group_boundaries,
        sum_by_int_keys,
    )
    from ..graph.build import _pairs_from_sorted_key_items
    from ..stages.dedup import shingle_sets_batch

    def long_rows(t: pa.Table) -> pa.Table:
        # Arrow path into the shingle hasher: zero-copy into polars, no
        # per-doc Python str materialization (bit-identical hash family)
        sets = shingle_sets_batch(pa.compute.fill_null(t["text"], ""))
        sizes = np.array([len(s) for s in sets], np.int64)
        doc = np.repeat(t["doc_id"].to_numpy(), sizes)
        sh = (
            np.concatenate(sets).astype(np.int64)
            if sizes.sum()
            else np.empty(0, np.int64)
        )
        return pa.table({"sh": sh, "doc": doc})

    long = _docs(sf_dir).map_batches(long_rows, batch_format="pyarrow")

    def df_cut_pairs(t: pa.Table) -> pa.Table:
        sh = t["sh"].to_numpy()
        doc = t["doc"].to_numpy()
        order = np.lexsort((doc, sh))
        sh_s, doc_s = sh[order], doc[order]
        n = len(sh_s)
        if n:
            flag = np.empty(n, bool)
            flag[0] = True
            np.not_equal(sh_s[1:], sh_s[:-1], out=flag[1:])
            starts = np.flatnonzero(flag)
        else:
            starts = np.empty(0, np.int64)
        # group id per row, df per shingle group ((doc, sh) rows are
        # globally distinct, so group size == document frequency)
        gid = np.zeros(n, np.int64)
        gid[starts] = 1
        gid = np.cumsum(gid) - 1
        df = np.diff(np.append(starts, n))
        keep = df[gid] <= df_max
        doc_k, gid_k = doc_s[keep], gid[keep]
        ud, cnt = (
            np.unique(doc_k, return_counts=True)
            if len(doc_k)
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        a, b = _pairs_from_sorted_key_items(gid_k, doc_k, df_max + 1)
        if len(a):
            sc, pstarts, _ = group_boundaries([a, b])
            pa_, pb_ = sc[0][pstarts], sc[1][pstarts]
            pcnt = np.diff(np.append(pstarts, len(a)))
        else:
            pa_ = pb_ = pcnt = np.empty(0, np.int64)
        return pa.table(
            {
                "doc_a": np.concatenate([ud, pa_]),
                "doc_b": np.concatenate([np.full(len(ud), -1, np.int64), pb_]),
                "cnt": np.concatenate([cnt.astype(np.int64), pcnt]),
            }
        )

    tagged = bucketed_group_combine(long, ["sh"], df_cut_pairs)
    summed = bucketed_group_combine(
        tagged, ["doc_a", "doc_b"], sum_by_int_keys(["doc_a", "doc_b"], "cnt")
    )

    def _split_sizes(t: pa.Table):
        da = t["doc_a"].to_numpy()
        db = t["doc_b"].to_numpy()
        c = t["cnt"].to_numpy()
        is_size = db == -1
        s_doc = da[is_size]
        s_n = c[is_size]
        order = np.argsort(s_doc, kind="stable")
        return da[~is_size], db[~is_size], c[~is_size], s_doc[order], s_n[order]

    def attach_a(t: pa.Table) -> pa.Table:
        da, db, c, s_doc, s_n = _split_sizes(t)
        n_a = s_n[np.searchsorted(s_doc, da)] if len(da) else np.empty(0, np.int64)
        # pair rows re-keyed on doc_b; size rows re-emitted under their doc
        return pa.table(
            {
                "doc_a": np.concatenate([db, s_doc]),  # the NEW key column
                "doc_b": np.concatenate([da, np.full(len(s_doc), -1, np.int64)]),
                "cnt": np.concatenate([c, s_n]),
                "n_a": np.concatenate([n_a, np.zeros(len(s_doc), np.int64)]),
            }
        )

    keyed_b = bucketed_group_combine(summed, ["doc_a"], attach_a)

    def attach_b_filter(t: pa.Table) -> pa.Table:
        db = t["doc_a"].to_numpy()  # key column currently holds doc_b
        da = t["doc_b"].to_numpy()
        c = t["cnt"].to_numpy()
        na = t["n_a"].to_numpy()
        is_size = da == -1
        s_doc = db[is_size]
        s_n = c[is_size]
        order = np.argsort(s_doc, kind="stable")
        s_doc, s_n = s_doc[order], s_n[order]
        da, db, c, na = da[~is_size], db[~is_size], c[~is_size], na[~is_size]
        nb = s_n[np.searchsorted(s_doc, db)] if len(db) else np.empty(0, np.int64)
        jac = c.astype(np.float64) / (na + nb - c)
        m = jac >= threshold
        return pa.table(
            {
                "doc_a": da[m],
                "doc_b": db[m],
                "n_inter": c[m],
                "n_a": na[m],
                "n_b": nb[m],
                "jaccard": jac[m],
            }
        )

    verified = bucketed_group_combine(keyed_b, ["doc_a"], attach_b_filter)
    if not as_pandas:
        return verified
    out = verified.to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
                "n_inter": pd.Series([], dtype=np.int64),
                "n_a": pd.Series([], dtype=np.int64),
                "n_b": pd.Series([], dtype=np.int64),
                "jaccard": pd.Series([], dtype=np.float64),
            }
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# GPT2-style pretokenizer, minus the \s+(?!\S) lookahead pieces (neither
# Rust regex nor RE2 supports lookahead; whitespace runs are simply not
# counted as tokens). Leftmost-first alternation semantics agree between
# polars (Rust regex) and DuckDB (RE2) — parity is oracle-verified.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_counts(sf_dir: str) -> rd.Dataset:
    """Per-document token counting two ways (a training-data-pipeline
    staple): whitespace tokens (``\\S+`` runs) and BPE-ish pretokenizer
    tokens (``BPE_ISH_RE``). One vectorized polars pass per batch, no
    exchange — embarrassingly parallel."""
    from ..stages.text import _pl_utf8

    def fn(t: pa.Table) -> pa.Table:
        s = _pl_utf8(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": s.str.count_matches(r"\S+")
                .to_numpy().astype(np.int64),
                "n_bpe_tokens": s.str.count_matches(BPE_ISH_RE)
                .to_numpy().astype(np.int64),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def benchmark_contamination(sf_dir: str, n: int = 3, bench_mod: int = 13):
    """Benchmark-contamination check (a training-data-pipeline staple: did
    eval-set n-grams leak into the training corpus?). Benchmark set = the
    deterministic ~1% slice ``doc_id % bench_mod == 0`` (the stand-in for a
    held-out eval suite); for each benchmark document, count its DISTINCT
    word-n-gram shingles and how many of them appear in at least one
    non-benchmark (training) document. Shingles use the md5 family
    (stages/dedup_md5 — same windowing as the sketch twins), so the SQL
    twin compares the shingle STRINGS and matches exactly absent a 64-bit
    md5 collision (the ngram_jaccard_dup caveat).

    Scale shape: one shingle pass, then TWO keyed exchanges — (1) on
    shingle hash: per-bucket (sh, doc) dedup, per-shingle has-train flag,
    per-doc partial counts pre-combined in-bucket (the combiner — what
    crosses exchange 2 is bench-doc-scale, not token-scale); (2) on doc:
    exact int sums. Token-scale exchange 1 is the exact operator's floor
    (every shingle occurrence must meet the global train set once).

    Returns (doc_id, n_shingles, n_contaminated, contamination_rate)."""
    from ..functions.bucketing import bucketed_group_combine
    from ..functions.rounding import round_half_away
    from ..stages.dedup_md5 import shingle_sets_md5_batch

    def long_rows(t: pa.Table) -> pa.Table:
        sets = shingle_sets_md5_batch(pa.compute.fill_null(t["text"], ""), n)
        sizes = np.array([len(s) for s in sets], np.int64)
        doc = np.repeat(t["doc_id"].to_numpy(), sizes)
        sh = (
            np.concatenate(sets).view(np.int64)
            if sizes.sum()
            else np.empty(0, np.int64)
        )
        return pa.table({"sh": sh, "doc": doc})

    long = _docs(sf_dir).map_batches(long_rows, batch_format="pyarrow")

    def contam_bucket(t: pa.Table) -> pa.Table:
        sh = t["sh"].to_numpy()
        doc = t["doc"].to_numpy()
        order = np.lexsort((doc, sh))
        sh_s, doc_s = sh[order], doc[order]
        keep = np.ones(len(sh_s), bool)
        keep[1:] = (sh_s[1:] != sh_s[:-1]) | (doc_s[1:] != doc_s[:-1])
        sh_s, doc_s = sh_s[keep], doc_s[keep]
        nrows = len(sh_s)
        if nrows == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "n_sh": pa.array([], pa.int64()),
                             "n_cont": pa.array([], pa.int64())})
        starts = np.flatnonzero(
            np.concatenate([[True], sh_s[1:] != sh_s[:-1]])
        )
        gid = np.zeros(nrows, np.int64)
        gid[starts] = 1
        gid = np.cumsum(gid) - 1
        is_bench = doc_s % bench_mod == 0
        has_train = np.zeros(len(starts), np.int64)
        np.maximum.at(has_train, gid, (~is_bench).astype(np.int64))
        bdoc = doc_s[is_bench]
        bcont = has_train[gid[is_bench]]
        ud, inv = np.unique(bdoc, return_inverse=True)
        n_sh = np.bincount(inv, minlength=len(ud)).astype(np.int64)
        n_cont = np.bincount(inv, weights=bcont,
                             minlength=len(ud)).astype(np.int64)
        return pa.table({"doc": ud, "n_sh": n_sh, "n_cont": n_cont})

    partials = bucketed_group_combine(long, ["sh"], contam_bucket)

    def sum_bucket(t: pa.Table) -> pa.Table:
        doc = t["doc"].to_numpy()
        ud, inv = np.unique(doc, return_inverse=True)
        n_sh = np.bincount(inv, weights=t["n_sh"].to_numpy(),
                           minlength=len(ud)).astype(np.int64)
        n_cont = np.bincount(inv, weights=t["n_cont"].to_numpy(),
                             minlength=len(ud)).astype(np.int64)
        return pa.table({"doc_id": ud, "n_shingles": n_sh,
                         "n_contaminated": n_cont})

    out = bucketed_group_combine(partials, ["doc"], sum_bucket).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    out["contamination_rate"] = round_half_away(
        out["n_contaminated"].to_numpy() / out["n_shingles"].to_numpy(), 9
    )
    return out


def corpus_mix_report(sf_dir: str):
    """Per-source corpus-mix report (the training-data 'what am I training
    on' table): doc count, char volume, whitespace + BPE-ish token volume,
    distinct languages. One vectorized pass with per-(source,lang) partials
    (the combiner — sources × langs rows leave each batch); tiny final.
    Counts/sums are exact ints, hash-exact vs SQL."""
    from ..stages.text import _pl_utf8

    ds = _docs(sf_dir, columns=("doc_id", "text", "lang", "source",
                                "n_chars"))

    def partials(t: pa.Table) -> pa.Table:
        s = _pl_utf8(t["text"])
        df = pd.DataFrame({
            "source": t["source"].to_pandas(),
            "lang": t["lang"].to_pandas(),
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
            "ws": s.str.count_matches(r"\S+").to_numpy().astype(np.int64),
            "bpe": s.str.count_matches(BPE_ISH_RE)
            .to_numpy().astype(np.int64),
        })
        # dropna=False: a null source/lang must not silently drop rows from
        # the volume sums (SQL GROUP BY keeps NULL groups; only
        # COUNT(DISTINCT lang) excludes NULLs, mirrored by nunique below)
        g = df.groupby(["source", "lang"], sort=False, dropna=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"),
            sum_ws_tokens=("ws", "sum"), sum_bpe_tokens=("bpe", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    by_sl = parts.groupby(["source", "lang"], sort=True,
                          dropna=False).sum().reset_index()
    out = by_sl.groupby("source", sort=True, dropna=False).agg(
        n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"),
        sum_ws_tokens=("sum_ws_tokens", "sum"),
        sum_bpe_tokens=("sum_bpe_tokens", "sum"),
        n_langs=("lang", "nunique"),
    ).reset_index()
    for c in ["n_docs", "sum_chars", "sum_ws_tokens", "sum_bpe_tokens",
              "n_langs"]:
        out[c] = out[c].astype(np.int64)
    return out


def doc_top_terms(sf_dir: str, k: int = 5):
    """Top-k salient terms per document, ranked by (tf DESC, df ASC, term
    ASC) — the tf-idf-shaped ranking kept ALL-INTEGER (no float idf, so the
    driver hash-checks it exactly; a log-idf score is one elementwise map
    away client-side). tf comes free per batch (documents are row-atomic);
    df needs one term-keyed exchange; the df join and the per-doc top-k are
    one exchange each. Term vocabulary crosses the wire, not the corpus."""
    from ..functions.bucketing import bucketed_group_combine
    from ..stages.dedup_md5 import tokens_flat

    def tf_rows(t: pa.Table) -> pa.Table:
        toks, offs = tokens_flat(pa.compute.fill_null(t["text"], ""))
        counts = np.diff(offs)
        doc = np.repeat(t["doc_id"].to_numpy(), counts)
        df_ = pd.DataFrame({"doc": doc, "term": toks})
        g = df_.groupby(["doc", "term"], sort=False).size().reset_index(
            name="tf")
        return pa.Table.from_pandas(g, preserve_index=False)

    tf_ds = _docs(sf_dir).map_batches(tf_rows, batch_format="pyarrow")

    # df per term + join onto tf rows in ONE term-keyed exchange (every
    # term's rows land in one bucket, so the bucket computes its terms' df
    # from its own rows — no separate df table or second pass)
    def df_join(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas()
        dfc = df_.groupby("term", sort=False)["doc"].nunique()
        df_["df"] = dfc[df_["term"]].to_numpy().astype(np.int64)
        return pa.Table.from_pandas(df_, preserve_index=False)

    annotated = bucketed_group_combine(tf_ds, ["term"], df_join)

    def topk(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas().sort_values(
            ["doc", "tf", "df", "term"],
            ascending=[True, False, True, True],
        )
        return pa.Table.from_pandas(
            df_.groupby("doc", sort=False).head(k), preserve_index=False
        )

    out = bucketed_group_combine(annotated, ["doc"], topk).to_pandas()
    out = out.rename(columns={"doc": "doc_id"}).sort_values(
        ["doc_id", "tf", "df", "term"],
        ascending=[True, False, True, True],
    ).reset_index(drop=True)
    out["tf"] = out["tf"].astype(np.int64)
    return out[["doc_id", "term", "tf", "df"]]


def bigram_logprob(sf_dir: str, as_pandas: bool = True):
    """Bigram-LM perplexity scoring — the classic perplexity-filter pass of
    a training-data pipeline (score each document under an n-gram language
    model trained on the corpus itself; low-probability docs are filter
    candidates). Model: add-one-smoothed bigram LM over whitespace tokens,
    P(w2|w1) = (c(w1,w2) + 1) / (c(w1 ·) + V), with c(w1 ·) the corpus
    count of bigrams starting w1 and V the corpus vocabulary size. Per doc
    (≥ 2 tokens): n_bigrams, logprob_sum = Σ ln P over the document's
    bigrams IN DOCUMENT ORDER (a left fold — the order is part of the
    contract so the float is hash-exact), ppl = exp(−logprob_sum /
    n_bigrams).

    Scale shape — token-scale rows cross three keyed exchanges, nothing
    vocabulary- or corpus-scale on the driver:
      1. keyed on bigram hash: every occurrence of a bigram lands in one
         bucket, so its global count c2 is the bucket-local group size;
      2. keyed on first-word hash: same trick for the continuation count
         c1 (rows ride through with their c2 attached);
      3. keyed on doc: sort by position, left-fold ln((c2+1)/(c1+V))
         through libm (DuckDB's ln — numpy's SIMD ln differs by ulps).
    V comes from one distinct-count exchange over the token hashes (a
    per-bucket distinct partial + a scalar driver sum). Engine counts key
    on md5_u64 of the token strings (the ngram_jaccard 64-bit-collision
    caveat applies; the twin compares strings)."""
    import math

    from ..functions.bucketing import bucketed_group_combine
    from ..stages.dedup_md5 import md5_u64, tokens_flat

    SEP = "\x1f"

    def bigram_rows(t: pa.Table) -> pa.Table:
        toks, offs = tokens_flat(pa.compute.fill_null(t["text"], ""))
        counts = np.diff(offs)
        doc_ids = t["doc_id"].to_numpy()
        h_tok = md5_u64(toks)
        # bigram at position p pairs token p-1 with token p (within doc)
        n_bi = np.maximum(counts - 1, 0)
        doc = np.repeat(doc_ids, n_bi)
        keep = np.ones(len(toks), bool)
        keep[offs[:-1][counts > 0]] = False  # drop each doc's first token
        w2_idx = np.flatnonzero(keep)
        w1_idx = w2_idx - 1
        pos = (w2_idx - np.repeat(offs[:-1], n_bi)).astype(np.int64)
        pair = (np.char.add(np.char.add(
            toks[w1_idx].astype("U"), SEP), toks[w2_idx].astype("U"))
            .astype(object))
        return pa.table(
            {
                "h2": md5_u64(pair).view(np.int64),
                "h1": h_tok[w1_idx].view(np.int64),
                "doc": doc,
                "pos": pos,
            }
        )

    bi = _docs(sf_dir).map_batches(bigram_rows, batch_format="pyarrow")

    # V: distinct tokens, per-bucket distinct partials -> scalar sum
    def tok_rows(t: pa.Table) -> pa.Table:
        toks, _ = tokens_flat(pa.compute.fill_null(t["text"], ""))
        return pa.table({"h": np.unique(md5_u64(toks)).view(np.int64)})

    def distinct_count(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": np.array([len(np.unique(t["h"].to_numpy()))], np.int64)}
        )

    v_parts = bucketed_group_combine(
        _docs(sf_dir).map_batches(tok_rows, batch_format="pyarrow"),
        ["h"], distinct_count,
    ).to_pandas()
    V = int(v_parts["n"].sum())

    def attach_c2(t: pa.Table) -> pa.Table:
        h2 = t["h2"].to_numpy()
        uq, inv, cnt = np.unique(h2, return_inverse=True, return_counts=True)
        return pa.table(
            {
                "h1": t["h1"].combine_chunks(),
                "doc": t["doc"].combine_chunks(),
                "pos": t["pos"].combine_chunks(),
                "c2": cnt[inv].astype(np.int64),
            }
        )

    def attach_c1(t: pa.Table) -> pa.Table:
        h1 = t["h1"].to_numpy()
        uq, inv, cnt = np.unique(h1, return_inverse=True, return_counts=True)
        return pa.table(
            {
                "doc": t["doc"].combine_chunks(),
                "pos": t["pos"].combine_chunks(),
                "c2": t["c2"].combine_chunks(),
                "c1": cnt[inv].astype(np.int64),
            }
        )

    with_c2 = bucketed_group_combine(bi, ["h2"], attach_c2)
    with_c1 = bucketed_group_combine(with_c2, ["h1"], attach_c1)

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["doc", "pos"])
        docs, sums, ns, ppls = [], [], [], []
        for doc, g in df.groupby("doc", sort=True):
            c2 = g["c2"].to_numpy()
            c1 = g["c1"].to_numpy()
            s = 0.0
            first = True
            for a, b in zip(c2, c1):
                v = math.log((a + 1) / (b + V))
                s = v if first else s + v
                first = False
            n = len(c2)
            docs.append(doc)
            sums.append(s)
            ns.append(n)
            ppls.append(math.exp(-s / n))
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "n_bigrams": pa.array(ns, pa.int64()),
                "logprob_sum": pa.array(sums, pa.float64()),
                "ppl": pa.array(ppls, pa.float64()),
            }
        )

    out = bucketed_group_combine(with_c1, ["doc"], fold)
    if not as_pandas:
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def substring_dup_spans(sf_dir: str, k: int = 8, as_pandas: bool = True):
    """Exact duplicated-substring signal (the Lee et al. 2022 "Deduplicating
    Training Data" substring-dedup shape): a token window of length ``k``
    is DUPLICATED iff its word-k-gram occurs ≥ 2 times in the corpus
    (counting multiplicity — a doc repeating itself counts); per document,
    report the window count, the duplicated-window count, and the number
    of tokens covered by the UNION of duplicated windows (the span a
    substring-dedup pass would cut). Windowing follows the md5 shingle
    family (docs with 0 < cnt < k contribute ONE window over all cnt
    tokens).

    Scale shape: window-scale rows cross TWO keyed exchanges — (1) on the
    window hash: global multiplicity is bucket-local, only duplicated
    windows (doc, pos) come back out; (2) on doc: vectorized interval-union
    merge (windows have constant width per doc, so coverage is
    Σ min(w, next_pos − pos) over the sorted positions). Per-doc stats ride
    to exchange 2 as sentinel rows. md5-hash keying carries the
    ngram_jaccard 64-bit-collision caveat; the twin compares strings.

    Returns (doc_id, n_windows, n_dup_windows, n_dup_tokens)."""
    from ..functions.bucketing import bucketed_group_combine
    from ..stages.dedup_md5 import shingle_hashes_md5, tokens_flat

    def window_rows(t: pa.Table) -> pa.Table:
        texts = pa.compute.fill_null(t["text"], "")
        flat, offs = shingle_hashes_md5(texts, k)
        counts = np.diff(offs)
        doc_ids = t["doc_id"].to_numpy()
        doc = np.repeat(doc_ids, counts)
        pos = (np.arange(offs[-1]) - np.repeat(offs[:-1], counts)).astype(
            np.int64
        )
        return pa.table({"h": flat.view(np.int64), "doc": doc, "pos": pos})

    def stat_rows(t: pa.Table) -> pa.Table:
        texts = pa.compute.fill_null(t["text"], "")
        _, toffs = tokens_flat(texts)
        nt = np.diff(toffs).astype(np.int64)
        nw = np.where(nt == 0, 0, np.where(nt < k, 1, nt - k + 1))
        return pa.table(
            {
                "doc": t["doc_id"].combine_chunks(),
                "pos": np.full(len(nt), -1, np.int64),  # sentinel
                "nw": nw,
                "nt": nt,
            }
        )

    wins = _docs(sf_dir).map_batches(window_rows, batch_format="pyarrow")

    def dup_only(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy()
        uq, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        m = cnt[inv] >= 2
        n = int(m.sum())
        return pa.table(
            {
                "doc": t["doc"].to_numpy()[m],
                "pos": t["pos"].to_numpy()[m],
                "nw": np.full(n, -1, np.int64),
                "nt": np.full(n, -1, np.int64),
            }
        )

    dups = bucketed_group_combine(wins, ["h"], dup_only)
    stats = _docs(sf_dir).map_batches(stat_rows, batch_format="pyarrow")

    def per_doc(t: pa.Table) -> pa.Table:
        doc = t["doc"].to_numpy()
        pos = t["pos"].to_numpy()
        nw = t["nw"].to_numpy()
        nt = t["nt"].to_numpy()
        is_stat = pos == -1
        s_doc, s_nw, s_nt = doc[is_stat], nw[is_stat], nt[is_stat]
        so = np.argsort(s_doc, kind="stable")
        s_doc, s_nw, s_nt = s_doc[so], s_nw[so], s_nt[so]
        d_doc, d_pos = doc[~is_stat], pos[~is_stat]
        order = np.lexsort((d_pos, d_doc))
        d_doc, d_pos = d_doc[order], d_pos[order]
        # per-doc window width: min(k, token count)
        w = np.minimum(k, s_nt[np.searchsorted(s_doc, d_doc)]) if len(d_doc) \
            else np.empty(0, np.int64)
        # interval union over sorted same-width windows: each window
        # contributes min(w, next_pos - pos); the last of a doc contributes w
        if len(d_doc):
            last = np.ones(len(d_doc), bool)
            last[:-1] = d_doc[1:] != d_doc[:-1]
            gap = np.empty(len(d_doc), np.int64)
            gap[:-1] = d_pos[1:] - d_pos[:-1]
            gap[last] = 0  # overwritten below
            contrib = np.where(last, w, np.minimum(w, gap))
            nd_tok = np.zeros(len(s_doc), np.int64)
            nd_win = np.zeros(len(s_doc), np.int64)
            di = np.searchsorted(s_doc, d_doc)
            np.add.at(nd_tok, di, contrib)
            np.add.at(nd_win, di, 1)
        else:
            nd_tok = np.zeros(len(s_doc), np.int64)
            nd_win = np.zeros(len(s_doc), np.int64)
        return pa.table(
            {
                "doc_id": s_doc,
                "n_windows": s_nw,
                "n_dup_windows": nd_win,
                "n_dup_tokens": nd_tok,
            }
        )

    out = bucketed_group_combine(dups.union(stats), ["doc"], per_doc)
    if not as_pandas:
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def corpus_kl_drift(sf_dir: str):
    """Per-source distribution drift — KL(P_source || P_corpus) over
    add-one-smoothed unigram token distributions (the corpus-mix
    monitoring op next to corpus_mix_report: a source whose language
    drifts from the blend shows up as rising KL). P_s(w) =
    (c_s(w)+1)/(n_s+V), Q(w) = (c(w)+1)/(n+V), KL = Σ_w P_s ln(P_s/Q)
    over the FULL corpus vocabulary (absent words contribute their
    smoothed mass).

    Determinism contract: per source the vocabulary is sorted ascending by
    token string (Python code-point order == DuckDB binary UTF-8 order)
    and the sum folds LEFT TO RIGHT through libm ln. Scale shape: one
    token-keyed exchange computes global + per-source counts in-bucket and
    fans each token out to every source (|V| × |sources| rows — sources
    are few by construction); one source-keyed exchange folds. Totals
    (n_s, n, V) come from tiny scalar aggregates.

    Returns (source, n_tokens, kl)."""
    import math

    from ..functions.bucketing import bucketed_group_combine

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def tok_partials(t: pa.Table) -> pa.Table:
        from ..stages.text import _pl_utf8

        toks = _pl_utf8(t["text"]).str.extract_all(r"\S+")
        counts = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls().to_pandas().to_numpy()
        src = np.repeat(
            t["source"].to_pandas().fillna("").to_numpy(), counts
        )
        df = pd.DataFrame({"token": flat, "source": src})
        g = df.groupby(["token", "source"], sort=False).size().reset_index(
            name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = docs.map_batches(tok_partials, batch_format="pyarrow")

    # tiny driver smalls: per-source token totals (source-cardinality rows
    # per batch) and V via a distinct-count exchange — nothing vocab-scale
    # reaches the driver
    def src_counts(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": t["source"].to_pandas(),
            "cnt": t["cnt"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("source", sort=False)["cnt"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    st = partials.map_batches(
        src_counts, batch_format="pyarrow"
    ).to_pandas().groupby("source")["cnt"].sum()
    sources = sorted(st.index)
    n_total = int(st.sum())

    from ..stages.dedup_md5 import md5_u64

    def tok_hash_rows(t: pa.Table) -> pa.Table:
        toks = t["token"].to_pandas().to_numpy()
        return pa.table({"h": np.unique(md5_u64(toks)).view(np.int64)})

    def distinct_count(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": np.array([len(np.unique(t["h"].to_numpy()))], np.int64)}
        )

    V = int(
        bucketed_group_combine(
            partials.map_batches(tok_hash_rows, batch_format="pyarrow"),
            ["h"], distinct_count,
        ).to_pandas()["n"].sum()
    )
    src_ref = ray.put((sources, {s: int(v) for s, v in st.items()},
                       n_total, V))

    def fan_out(t: pa.Table) -> pa.Table:
        srcs, _, _, _ = ray.get(src_ref)
        df = t.to_pandas()
        pv = df.pivot_table(index="token", columns="source", values="cnt",
                            aggfunc="sum", fill_value=0)
        pv = pv.reindex(columns=srcs, fill_value=0)
        toks = pv.index.to_numpy()
        mat = pv.to_numpy().astype(np.int64)  # (|tokens|, |sources|)
        glob = mat.sum(axis=1)
        S = len(srcs)
        return pa.Table.from_pandas(
            pd.DataFrame({
                "source": np.tile(np.array(srcs, object), len(toks)),
                "token": np.repeat(toks, S),
                "cs": mat.ravel(),
                "c": np.repeat(glob, S),
            }),
            preserve_index=False,
        )

    fanned = bucketed_group_combine(partials, ["token"], fan_out)

    def fold(t: pa.Table) -> pa.Table:
        srcs, ns_of, n, V_ = ray.get(src_ref)
        df = t.to_pandas().sort_values(["source", "token"])
        out_s, out_n, out_kl = [], [], []
        for s, g in df.groupby("source", sort=True):
            ns = ns_of[s]
            acc = 0.0
            first = True
            for cs, c in zip(g["cs"].to_numpy(), g["c"].to_numpy()):
                p = (int(cs) + 1) / (ns + V_)
                q = (int(c) + 1) / (n + V_)
                v = p * math.log(p / q)
                acc = v if first else acc + v
                first = False
            out_s.append(s)
            out_n.append(ns)
            out_kl.append(acc)
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "kl": pa.array(out_kl, pa.float64()),
            }
        )

    out = bucketed_group_combine(fanned, ["source"], fold).to_pandas()
    return out.sort_values("source").reset_index(drop=True)


def bpe_train(sf_dir: str, n_merges: int = 50):
    """BPE merge-rule induction (Sennrich et al. 2016 — tokenizer training,
    the canonical vocabulary-building pass of an LLM data pipeline):
    whitespace words split into character symbols + a '</w>' end marker;
    repeatedly merge the most frequent adjacent symbol pair (tie → the
    lexicographically smallest (left, right) pair — deterministic, unlike
    dict-order implementations).

    Scale shape (how real BPE trainers work): the WORD-FREQUENCY dictionary
    is computed distributed (one token-keyed exchange of per-batch partial
    counts — corpus-scale text collapses to vocabulary-scale rows), then
    the merge loop runs driver-side over that compact dictionary with
    incremental pair-count updates (only words containing the merged pair
    are re-segmented each round).

    Returns (rank, left, right, freq) — freq = the merged pair's count at
    merge time, weighted by word frequency. Rows-only at the gate
    (iterative merges have no tractable SQL unroll); exactness pinned by a
    brute-force pytest oracle."""
    from collections import Counter, defaultdict

    from ..functions.bucketing import bucketed_group_combine

    def word_partials(t: pa.Table) -> pa.Table:
        from ..stages.text import _pl_utf8

        toks = (_pl_utf8(t["text"]).str.extract_all(r"\S+")
                .explode().drop_nulls())
        if len(toks) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = toks.value_counts()
        return pa.table({
            "word": vc["t"].to_arrow().cast(pa.string()),
            "cnt": vc["count"].to_numpy().astype(np.int64),
        })

    def sum_bucket(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "word": t["word"].to_pylist(),
            "cnt": t["cnt"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("word", sort=False)["cnt"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    vocab_df = bucketed_group_combine(
        _docs(sf_dir).map_batches(word_partials, batch_format="pyarrow"),
        ["word"], sum_bucket,
    ).to_pandas()

    # driver-side merge induction over the compact dictionary
    words = {
        tuple(w) + ("</w>",): int(c)
        for w, c in zip(vocab_df["word"], vocab_df["cnt"])
    }
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for w, c in words.items():
        for a, b in zip(w, w[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(w)
    merges = []
    for rank in range(n_merges):
        if not pair_counts:
            break
        # max count, tie -> lexicographically smallest pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        freq = pair_counts[best]
        if freq <= 0:
            break
        merges.append((rank, best[0], best[1], freq))
        joined = best[0] + best[1]
        affected = list(pair_words.pop(best, ()))
        for w in affected:
            c = words.pop(w, None)
            if c is None:
                continue
            # remove w's old pair contributions
            for a, b in zip(w, w[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(w)
            # re-segment w with the new merge applied greedily left-to-right
            out = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            words[nw] = words.get(nw, 0) + c
            for a, b in zip(nw, nw[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(nw)
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "freq"]
    ).astype({"rank": np.int64, "freq": np.int64})


def warc_ingest(sf_dir: str):
    """WARC → document-row ingest (the crawl pipeline's first stage, over
    REAL container bytes): each document's text is wrapped into a
    deterministic two-record WARC payload (warcinfo + response; every
    second id per-record-GZIPPED, the .warc.gz layout), then parsed back
    by the dependency-free reader (sources/warc.py) and the response body
    re-emitted with its sha256 — the BASELINE.json per-row content
    invariant driven through a real archive container. The DuckDB twin
    recomputes sha256(text) directly, so a hash match certifies the record
    framing, Content-Length handling and gzip-member splitting."""
    from ..functions.hashing import sha256_hex
    from ..sources.warc import parse_warc, synth_warc_payload

    def roundtrip(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = pa.compute.fill_null(t["text"], "").to_pylist()
        n_records, n_bytes, bodies = [], [], []
        for i, txt in zip(ids, texts):
            payload = synth_warc_payload(int(i), txt)
            recs = parse_warc(payload)
            resp = [b for h, b in recs if h.get("warc-type") == "response"]
            n_records.append(len(recs))
            n_bytes.append(len(resp[0]))
            bodies.append(resp[0].decode("utf-8"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_records": pa.array(n_records, pa.int64()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "content_sha256": sha256_hex(bodies),
            }
        )

    return _docs(sf_dir).map_batches(
        roundtrip, batch_format="pyarrow", batch_size=1024
    )
