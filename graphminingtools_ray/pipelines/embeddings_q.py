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

from ..functions.rounding import round_half_away
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


def ann_topk(sf_dir: str, n_queries: int = 16, k: int = 5):
    """For each of the ``n_queries`` lowest vec_ids: top-k cosine neighbors
    (self excluded), ranked by (cosine desc, vec_id asc).
    Returns (qid, neighbor_id, rank)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    q_pdf = ds.sort("vec_id").limit(n_queries).to_pandas()
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


def embedding_near_dup(sf_dir: str, threshold: float = 0.3):
    """Blocked embedding near-dup: candidate pairs restricted to equal
    ``label`` (the blocking key), cosine > threshold, a < b. The blocked
    groupby keeps the pair space linear in block sizes instead of O(n²)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(np.int64)
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        sims = _normalize(mat) @ _normalize(mat).T
        a, b = np.nonzero(np.triu(sims > threshold, k=1))
        lo = np.minimum(ids[a], ids[b]).astype(np.int64)
        hi = np.maximum(ids[a], ids[b]).astype(np.int64)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi})

    out = ds.groupby("label").map_groups(per_block, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype=np.int64), "vec_b": pd.Series([], dtype=np.int64)}
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
