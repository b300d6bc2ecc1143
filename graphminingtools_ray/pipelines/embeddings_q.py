"""Similarity search over the embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: the query matrix is
broadcast once (``ray.put``), each batch does one float64 matmul against it,
emits per-batch top-k candidates, and the driver merges Q×k rows. The scale
path (documented): LSH/IVF bucketing — assign each vector to
``argmax(random_hyperplane_projections)`` buckets in a first pass, then
restrict the matmul to the query's bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.tables import read_table


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _emb_to_numpy(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(ids), -1)
    return ids, mat


def _lowest_vec_ids(ds: rd.Dataset, n_queries: int) -> pd.DataFrame:
    """The ``n_queries`` lowest-vec_id rows WITHOUT a global sort barrier:
    per-batch partial bottom-n (combiner), driver merges only n×#blocks
    rows. Replaces ``sort("vec_id").limit(n)`` — an all-to-all exchange to
    pick 16 rows."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        kk = min(n_queries, len(ids))
        if kk == 0:
            return t
        keep = np.argpartition(ids, kk - 1)[:kk]
        return t.take(pa.array(np.sort(keep)))

    # parallel driver collect of the ≤n-per-block partials (to_pandas fetches
    # block refs concurrently; a serial iter_batches loop paid one driver
    # round-trip per block — measured ~2× the whole query's cost)
    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    return merged.head(n_queries).reset_index(drop=True)


def ann_topk(sf_dir: str, n_queries: int = 16, k: int = 5):
    """For each of the ``n_queries`` lowest vec_ids: top-k cosine neighbors
    (self excluded), ranked by (cosine desc, vec_id asc).
    Returns (qid, neighbor_id, rank)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    q_pdf = _lowest_vec_ids(ds, n_queries)
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    qn = _normalize(q_mat)
    ref = ray.put((q_ids, qn))

    def batch_topk(batch: pa.Table) -> pa.Table:
        _q_ids, _qn = ray.get(ref)
        ids, mat = _emb_to_numpy(batch)
        sims = _normalize(mat) @ _qn.T  # (B, Q)
        kk = min(k + 1, len(ids))  # +1 to survive self-exclusion
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        qcol, ncol, scol = [], [], []
        for qi in range(len(_q_ids)):
            cand = top[:, qi]
            qcol.append(np.full(len(cand), _q_ids[qi], dtype=np.int64))
            ncol.append(ids[cand])
            scol.append(sims[cand, qi])
        return pa.table(
            {
                "qid": np.concatenate(qcol),
                "neighbor_id": np.concatenate(ncol),
                "cos": np.concatenate(scol),
            }
        )

    cand = ds.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    cand = cand[cand["qid"] != cand["neighbor_id"]]
    cand = cand.sort_values(
        ["qid", "cos", "neighbor_id"], ascending=[True, False, True]
    )
    out = cand.groupby("qid", sort=True).head(k).copy()
    out["rank"] = out.groupby("qid").cumcount() + 1
    return pd.DataFrame(
        {
            "qid": out["qid"].to_numpy(np.int64),
            "neighbor_id": out["neighbor_id"].to_numpy(np.int64),
            "rank": out["rank"].to_numpy(np.int64),
        }
    )


def ann_topk_lsh(
    sf_dir: str, n_queries: int = 16, k: int = 5, n_planes: int = 8, seed: int = 23
):
    """Approximate top-k via random-hyperplane LSH (the documented scale
    path): vectors bucket by the sign pattern of ``X @ H``; each query
    searches its own bucket plus all 1-bit-flip neighbor buckets. Recall vs
    the brute-force baseline is asserted in tests, not 100% by design."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_pdf = _lowest_vec_ids(ds, n_queries)
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    dim = q_mat.shape[1]
    rng = np.random.default_rng(np.random.PCG64(seed))
    planes = rng.standard_normal((dim, n_planes))

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ planes) > 0
        return (bits @ (1 << np.arange(n_planes))).astype(np.int64)

    q_buckets = bucket_of(q_mat)
    # probe set per query: own bucket + 1-bit flips (multi-probe LSH)
    probe = {
        int(b) ^ f
        for b in q_buckets
        for f in [0] + [1 << i for i in range(n_planes)]
    }
    qn = _normalize(q_mat)
    ref = ray.put((q_ids, qn, q_buckets, probe))

    def batch_topk(batch: pa.Table) -> pa.Table:
        _q_ids, _qn, _qb, _probe = ray.get(ref)
        ids, mat = _emb_to_numpy(batch)
        vb = bucket_of(mat)
        m = np.isin(vb, np.fromiter(_probe, np.int64))
        ids, mat = ids[m], mat[m]
        if len(ids) == 0:
            return pa.table(
                {"qid": np.empty(0, np.int64), "neighbor_id": np.empty(0, np.int64),
                 "cos": np.empty(0, np.float64)}
            )
        sims = _normalize(mat) @ _qn.T
        kk = min(k + 1, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        qcol, ncol, scol = [], [], []
        for qi in range(len(_q_ids)):
            cand = top[:, qi]
            qcol.append(np.full(len(cand), _q_ids[qi], dtype=np.int64))
            ncol.append(ids[cand])
            scol.append(sims[cand, qi])
        return pa.table(
            {"qid": np.concatenate(qcol), "neighbor_id": np.concatenate(ncol),
             "cos": np.concatenate(scol)}
        )

    cand = ds.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    cand = cand[cand["qid"] != cand["neighbor_id"]]
    cand = cand.sort_values(["qid", "cos", "neighbor_id"], ascending=[True, False, True])
    out = cand.groupby("qid", sort=True).head(k).copy()
    out["rank"] = out.groupby("qid").cumcount() + 1
    return pd.DataFrame(
        {
            "qid": out["qid"].to_numpy(np.int64),
            "neighbor_id": out["neighbor_id"].to_numpy(np.int64),
            "rank": out["rank"].to_numpy(np.int64),
        }
    )


def embedding_near_dup(sf_dir: str, threshold: float = 0.3,
                       chunk_rows: int = 2048, tile_rows: int = 8192,
                       ds: rd.Dataset | None = None):
    """Blocked embedding near-dup: candidate pairs restricted to equal
    ``label`` (the blocking key), cosine > threshold, a < b.

    Skew handling is TWO-LEVEL — the O(n_label²) FLOPs are the semantics
    (exact all-pairs within a block), but neither memory nor a single
    task's wall time may scale with a hot label:

    1. a cheap label-size pass (per-batch partial counts → label-scale
       driver final) decides each label's chunk count
       nc = ceil(n / tile_rows);
    2. every vector of a tiled label (nc > 1) is fanned out to its nc
       TILES — vector in chunk c (seeded hash of vec_id) participates in
       tiles (c, j) for j ≥ c as the row side and (i, c) for i < c as the
       column side (the standard distributed all-pairs tiling; data
       inflation × nc applies only to the hot labels);
    3. ONE bucketed exchange keyed (label, tile_i, tile_j) — each tile task
       multiplies its row chunk against its column chunk (≤ tile_rows² per
       TASK, and within the task the matmul still runs in ``chunk_rows``
       strips for heap bounds). Tiles partition the pair space, so no
       dedup pass is needed.
    Labels with nc == 1 take the same path with a single (0, 0) tile."""
    from ..functions.bucketing import bucketed_group_combine

    if ds is None:
        ds = read_table(sf_dir, "embeddings",
                        columns=["vec_id", "embedding", "label"])

    # pass 1: label sizes (label-scale final on the driver — label is a
    # BLOCKING key, its cardinality is modest by construction)
    def size_partial(t: pa.Table) -> pa.Table:
        # label-type-agnostic partial counts (labels may be int or string)
        vc = t["label"].to_pandas().value_counts()
        g = pd.DataFrame({"label": vc.index, "n": vc.to_numpy(np.int64)})
        return pa.Table.from_pandas(g, preserve_index=False)

    sizes = (
        ds.map_batches(size_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("label")["n"].sum()
    )
    nc_of = {
        lab: int(-(-n // tile_rows)) for lab, n in sizes.items()
    }
    nc_ref = ray.put(nc_of)

    def fan_out(t: pa.Table) -> pa.Table:
        nc_ = ray.get(nc_ref)
        labels = t["label"].to_pandas()
        ids = t["vec_id"].to_numpy()
        ncs = labels.map(nc_).to_numpy(np.int64)
        chunk = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 >> np.uint64(33)).astype(np.int64) % np.maximum(ncs, 1)
        # vector in chunk c of an nc-tiled label joins nc tiles:
        # (min(c,k), max(c,k)) for k in 0..nc-1
        reps = np.repeat(np.arange(len(ids)), ncs)
        k = (np.arange(ncs.sum()) -
             np.repeat(np.cumsum(ncs) - ncs, ncs))  # 0..nc-1 per vector
        c = chunk[reps]
        ti = np.minimum(c, k)
        tj = np.maximum(c, k)
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                "label": t["label"].take(pa.array(reps)),
                "ti": ti,
                "tj": tj,
                "chunk": c,
                "vec_id": ids[reps],
                "embedding": col.take(pa.array(reps)),
            }
        )

    tiled = ds.map_batches(fan_out, batch_format="pyarrow")

    def tile_combine(t: pa.Table) -> pa.Table:
        labels = t["label"].to_pandas()
        ids = t["vec_id"].to_numpy()
        ch = t["chunk"].to_numpy()
        ti_all = t["ti"].to_numpy()
        tj_all = t["tj"].to_numpy()
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        mat = _normalize(flat.reshape(len(ids), -1))
        a_out, b_out = [], []
        # group rows by (label, ti, tj) — a bucket can hold many tiles
        gdf = pd.DataFrame({"label": labels, "ti": ti_all, "tj": tj_all})
        groups = gdf.groupby(["label", "ti", "tj"], sort=True).indices
        for (lab, ti, tj), idxs in groups.items():
            idxs = np.asarray(idxs)
            rows = idxs[ch[idxs] == ti]
            cols = idxs[ch[idxs] == tj]
            rid, rmat = ids[rows], mat[rows]
            cid, cmat = ids[cols], mat[cols]
            diag = ti == tj
            for lo_ in range(0, len(rid), chunk_rows):
                hi_ = min(lo_ + chunk_rows, len(rid))
                sims = rmat[lo_:hi_] @ cmat.T
                ai, bi = np.nonzero(sims > threshold)
                ra = rid[ai + lo_]
                rb = cid[bi]
                keep = ra < rb if diag else ra != rb
                a_out.append(np.minimum(ra[keep], rb[keep]))
                b_out.append(np.maximum(ra[keep], rb[keep]))
        if not a_out:
            return pa.table(
                {"vec_a": np.empty(0, np.int64), "vec_b": np.empty(0, np.int64)}
            )
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        # off-diagonal tiles may emit (a,b) twice? no — chunks partition the
        # label and each unordered chunk pair owns exactly one tile; but an
        # off-diagonal pair is computed once (row side ti, col side tj), so
        # no dedup is needed. Sort for determinism inside the bucket.
        order = np.lexsort((b, a))
        return pa.table({"vec_a": a[order], "vec_b": b[order]})

    out = bucketed_group_combine(
        tiled, ["label", "ti", "tj"], tile_combine
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype=np.int64), "vec_b": pd.Series([], dtype=np.int64)}
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def _spherical_kmeans(sample: np.ndarray, n_lists: int, iters: int) -> np.ndarray:
    """Deterministic spherical k-means (cosine IVF coarse quantizer): init =
    first ``n_lists`` sample rows (caller passes a vec_id-sorted sample, so
    the init is block-order-free), assign by max dot, recompute + renormalize;
    empty cells keep their previous centroid."""
    X = _normalize(sample)
    C = X[:n_lists].copy()
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        acc = np.zeros_like(C)
        np.add.at(acc, a, X)
        counts = np.bincount(a, minlength=n_lists)
        nz = counts > 0
        C[nz] = acc[nz] / counts[nz, None]
        C = _normalize(C)
    return C


def ann_topk_ivf(
    sf_dir: str,
    n_queries: int = 16,
    k: int = 5,
    n_lists: int = 32,
    n_probe: int = 8,
    sample_cap: int = 2048,
    iters: int = 8,
    seed: int = 7,
    ds: rd.Dataset | None = None,
):
    """Approximate top-k via IVF (inverted-file) cells — the second
    documented scale path next to ``ann_topk_lsh``: a spherical-k-means
    coarse quantizer is trained once on a seeded hash-sample (driver-side,
    bounded by ``sample_cap``), broadcast with the query matrix; every batch
    assigns its vectors to their nearest centroid cell and each query scores
    ONLY vectors in its own ``n_probe`` closest cells (true per-query IVF
    probe lists, not a shared filter). At corpus scale the assignment pass
    would bucket-materialize the cell lists once and reuse them across query
    batches; for a one-shot query set the fused scan is strictly cheaper.
    Recall vs the brute-force baseline is asserted in tests, not 100% by
    design. Deterministic in ``seed``."""
    if ds is None:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # ONE prep pass for both driver-side smalls (query rows = lowest
    # n_queries vec_ids; training sample = lowest sample_cap vec_ids of the
    # seeded ~1/4 hash-sample): per-batch partial bottom-n on each side, so
    # only (n_queries + sample_cap) x #blocks rows reach the driver — the
    # previous two full passes shipped the whole sampled quarter
    # (embedding payloads included) to the driver and did not scale.
    mult = np.uint64(0x9E3779B97F4A7C15 ^ (seed * 0x10001))

    def prep_partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        kq = min(n_queries, len(ids))
        keep_q = (np.sort(np.argpartition(ids, kq - 1)[:kq])
                  if kq else np.empty(0, np.int64))
        h = (ids.astype(np.uint64) * mult) >> np.uint64(32)
        m = np.flatnonzero((h % np.uint64(4)) == 0)
        ks = min(sample_cap, len(m))
        keep_s = (np.sort(m[np.argpartition(ids[m], ks - 1)[:ks]])
                  if ks else np.empty(0, np.int64))
        ta = t.take(pa.array(keep_q)).append_column(
            "side", pa.array(np.zeros(len(keep_q), np.int8)))
        tb = t.take(pa.array(keep_s)).append_column(
            "side", pa.array(np.ones(len(keep_s), np.int8)))
        return pa.concat_tables([ta, tb])

    prep = ds.map_batches(prep_partial, batch_format="pyarrow").to_pandas()
    sample_pdf = (prep[prep["side"] == 1].sort_values("vec_id")
                  .head(sample_cap).reset_index(drop=True))
    sample_mat = np.stack(sample_pdf["embedding"].to_numpy()).astype(np.float64)
    n_lists = max(1, min(n_lists, len(sample_mat)))
    n_probe = min(n_probe, n_lists)
    cents = _spherical_kmeans(sample_mat, n_lists, iters)

    q_pdf = (prep[prep["side"] == 0].sort_values("vec_id")
             .head(n_queries).reset_index(drop=True))
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    qn = _normalize(q_mat)
    # per-query probe lists: n_probe closest cells; (Q, n_lists) bool mask
    q_cell_sims = qn @ cents.T
    probe_cells = np.argpartition(-q_cell_sims, n_probe - 1, axis=1)[:, :n_probe]
    probe_mask = np.zeros((len(q_ids), n_lists), dtype=bool)
    np.put_along_axis(probe_mask, probe_cells, True, axis=1)
    ref = ray.put((q_ids, qn, cents, probe_mask))

    def batch_topk(batch: pa.Table) -> pa.Table:
        _q_ids, _qn, _cents, _mask = ray.get(ref)
        ids, mat = _emb_to_numpy(batch)
        vn = _normalize(mat)
        cell = np.argmax(vn @ _cents.T, axis=1)
        any_probe = _mask.any(axis=0)[cell]  # in at least one query's list
        ids, vn, cell = ids[any_probe], vn[any_probe], cell[any_probe]
        if len(ids) == 0:
            return pa.table(
                {"qid": np.empty(0, np.int64),
                 "neighbor_id": np.empty(0, np.int64),
                 "cos": np.empty(0, np.float64)}
            )
        sims = vn @ _qn.T  # (B, Q)
        sims[~_mask[:, cell].T] = -np.inf  # per-query probe restriction
        kk = min(k + 1, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        qcol, ncol, scol = [], [], []
        for qi in range(len(_q_ids)):
            cand = top[:, qi]
            keep = np.isfinite(sims[cand, qi])
            qcol.append(np.full(keep.sum(), _q_ids[qi], dtype=np.int64))
            ncol.append(ids[cand][keep])
            scol.append(sims[cand, qi][keep])
        return pa.table(
            {"qid": np.concatenate(qcol), "neighbor_id": np.concatenate(ncol),
             "cos": np.concatenate(scol)}
        )

    cand = ds.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    cand = cand[cand["qid"] != cand["neighbor_id"]]
    cand = cand.sort_values(
        ["qid", "cos", "neighbor_id"], ascending=[True, False, True]
    )
    out = cand.groupby("qid", sort=True).head(k).copy()
    out["rank"] = out.groupby("qid").cumcount() + 1
    return pd.DataFrame(
        {
            "qid": out["qid"].to_numpy(np.int64),
            "neighbor_id": out["neighbor_id"].to_numpy(np.int64),
            "rank": out["rank"].to_numpy(np.int64),
        }
    )


def ann_lsh_md5(
    sf_dir: str, n_queries: int = 16, k: int = 5, n_planes: int = 16,
    bands: int = 4,
):
    """SQL-oracled sign-LSH ANN twin: hyperplanes are ±1 vectors derived
    from md5 bits (``md5_u64('plane-j-d') & 1``), and the sign test runs on
    INTEGER-quantized components ``floor(v·1024 + 0.5)`` so the per-plane
    dot product is an exact int64 both here and in DuckDB (float SUMs are
    summation-order-dependent; elementwise quantization is not). Vectors
    bucket by the per-band sign-bit key; candidates share a band bucket
    with the query; final ranking is exact cosine among candidates — the
    same (cos desc, vec_id) rule as ``ann_topk``. The seeded-Gaussian
    ``ann_topk_lsh`` stays the recall-tested scale variant; this twin
    exists to drive the whole LSH shape (quantize → sign-hash → band →
    candidate → rank) through the driver's DuckDB gate."""
    from ..stages.dedup_md5 import md5_u64_one

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_pdf = _lowest_vec_ids(ds, n_queries)
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    dim = q_mat.shape[1]
    rows = n_planes // bands
    S = np.array(
        [
            [1 if md5_u64_one(f"plane-{j}-{d}") & 1 else -1 for d in range(dim)]
            for j in range(n_planes)
        ],
        np.int64,
    )

    def quant(mat: np.ndarray) -> np.ndarray:
        return np.floor(mat.astype(np.float64) * 1024.0 + 0.5).astype(np.int64)

    def band_keys(mat: np.ndarray) -> np.ndarray:
        h = (quant(mat) @ S.T) > 0  # (N, planes) exact-int signs
        w = np.int64(1) << np.arange(rows, dtype=np.int64)
        return (h.reshape(len(h), bands, rows) * w).sum(axis=2)

    qkeys = band_keys(q_mat)
    qn = _normalize(q_mat)
    ref = ray.put((q_ids, qkeys, qn, S))

    def batch_cand(batch: pa.Table) -> pa.Table:
        _q_ids, _qkeys, _qn, _S = ray.get(ref)
        ids, mat = _emb_to_numpy(batch)
        keys = band_keys(mat)
        sims = _normalize(mat) @ _qn.T  # (B, Q)
        share = (keys[:, None, :] == _qkeys[None, :, :]).any(axis=2)
        share &= ids[:, None] != _q_ids[None, :]
        bi, qi = np.nonzero(share)
        return pa.table(
            {
                "qid": _q_ids[qi],
                "neighbor_id": ids[bi],
                "cos": sims[bi, qi],
            }
        )

    cand = ds.map_batches(batch_cand, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["qid", "cos", "neighbor_id"], ascending=[True, False, True]
    )
    out = cand.groupby("qid", sort=True).head(k).copy()
    out["rank"] = out.groupby("qid").cumcount() + 1
    return pd.DataFrame(
        {
            "qid": out["qid"].to_numpy(np.int64),
            "neighbor_id": out["neighbor_id"].to_numpy(np.int64),
            "rank": out["rank"].to_numpy(np.int64),
        }
    )
