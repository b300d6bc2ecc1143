"""Deterministic random-walk corpus generation (DeepWalk / node2vec-style
walk sampling — the link-graph training-data op that feeds embedding
models; Perozzi et al. 2014).

One walk per start vertex, L steps. The next-hop choice is a DETERMINISTIC
seeded hash — neighbor index = md5_u64("{walk_id}:{step}") mod degree over
the dst-sorted neighbor list — so the walk corpus is reproducible
bit-for-bit across runs AND value-exact against a DuckDB twin
(md5_number_lower + ROW_NUMBER over the same neighbor order), unlike PRNG
walks whose stream depends on scheduling.

Scale shape: the adjacency crosses the wire ONCE into a hash-partitioned
CSR index in the object store (per-part: sorted srcs, dst-sorted neighbor
lists, offsets — the triangles probe-index pattern); each step exchanges
only the WALK rows (walk-scale, not edge-scale) keyed on the current
vertex, and the per-bucket step function reads its partition's CSR
zero-copy. L steps = L walk-scale exchanges + 1 edge-scale index build.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..algos.partitioned import PartCache, index_state
from ..functions.bucketing import (
    bucketed_group_combine,
    int_bucket,
    partition_group_combine,
)
from ..stages.dedup_md5 import md5_u64


def _adjacency_index(edges_symmetric, P: int, weighted: bool = False):
    """One keyed exchange → per-part CSR rows (srcs sorted, neighbors
    dst-sorted per src, offsets; with ``weighted`` also the per-src
    inclusive weight cumsum) in the object store."""

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(int_bucket(t["src"].to_numpy(), P))
        )

    def build_csr(t: pa.Table) -> pa.Table:
        part = int(t["part"][0].as_py())
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        w = (t["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
             if weighted else None)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        if weighted:
            w = w[order]
        # dedupe (src, dst): the walk semantics are over the simple graph
        keep = np.ones(len(s), bool)
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        s, d = s[keep], d[keep]
        srcs = np.unique(s)
        counts = np.bincount(np.searchsorted(srcs, s),
                             minlength=len(srcs))
        offsets = np.concatenate([[0], np.cumsum(counts)])
        cols = {
            "part": pa.array([part], pa.int64()),
            "srcs": pa.array([srcs], pa.list_(pa.int64())),
            "offsets": pa.array([offsets], pa.list_(pa.int64())),
            "nbrs": pa.array([d], pa.list_(pa.int64())),
        }
        if weighted:
            w = w[keep]
            # per-src inclusive cumsum (reset at src boundaries)
            cum = np.cumsum(w)
            base = np.repeat(
                np.concatenate([[0], cum])[offsets[:-1]], counts
            )
            cols["wcum"] = pa.array([cum - base], pa.list_(pa.int64()))
        return pa.table(cols)

    ds = partition_group_combine(
        edges_symmetric.map_batches(add_part, batch_format="pyarrow"),
        "part", P, build_csr,
    ).materialize()
    index, _ = index_state(ds)
    return index


def random_walks(edges_symmetric, length: int = 4, num_buckets: int = 32,
                 weighted: bool = False):
    """-> pandas DataFrame (walk_id, step, vertex_id): one deterministic
    L-step walk per start vertex of the simple symmetric graph.
    ``edges_symmetric`` must contain both half-edges, so every visited
    vertex has at least one neighbor. With ``weighted`` the transition is
    proportional to the integer edge weight: the seeded draw indexes the
    per-src inclusive weight cumsum (r = md5 mod W(v), first neighbor with
    cum > r) — still deterministic and SQL-exact."""
    P = num_buckets
    adj_index = _adjacency_index(edges_symmetric, P, weighted=weighted)
    adj_ref = ray.put(adj_index)

    # step-0 walk rows: one per vertex (walk_id = start vertex), derived
    # from the index itself so starts match the graph exactly
    @ray.remote
    def starts_of(block: pa.Table, row: int) -> np.ndarray:
        return block["srcs"][row].values.to_numpy(zero_copy_only=False)

    start_ids = np.concatenate(
        ray.get([starts_of.remote(ref, row)
                 for ref, row in adj_index.values()])
    )
    start_ids = np.unique(start_ids)

    import ray.data as rd

    cur = rd.from_arrow(pa.table({"walk_id": start_ids, "v": start_ids}))
    out_frames = [pd.DataFrame({
        "walk_id": start_ids,
        "step": np.zeros(len(start_ids), np.int64),
        "vertex_id": start_ids,
    })]

    for t_step in range(1, length + 1):
        def step_fn(t: pa.Table, _t_step=t_step) -> pa.Table:
            wid = t["walk_id"].to_numpy()
            v = t["v"].to_numpy()
            cache = PartCache(
                ray.get(adj_ref),
                ["srcs", "offsets", "nbrs", "wcum"] if weighted
                else ["srcs", "offsets", "nbrs"],
            )
            nxt = np.empty(len(v), np.int64)
            parts = int_bucket(v, P)
            # deterministic seeded pick: md5("{walk}:{step}") mod degree
            seeds = np.char.add(
                np.char.add(wid.astype(np.int64).astype("U"), ":"),
                f"{_t_step}",
            )
            h = md5_u64(seeds.astype(object))
            for p in np.unique(parts):
                m = parts == p
                entry = cache.get(int(p))
                if weighted:
                    srcs, offsets, nbrs, wcum = entry
                else:
                    srcs, offsets, nbrs = entry
                pos = np.searchsorted(srcs, v[m])
                if weighted:
                    # r = h mod W(v); pick the first neighbor whose
                    # inclusive cumsum exceeds r (weight-proportional)
                    lo = offsets[pos]
                    hi = offsets[pos + 1]
                    W = wcum[hi - 1].astype(np.uint64)
                    r = (h[m] % W).astype(np.int64)
                    idx = np.empty(len(r), np.int64)
                    for j in range(len(r)):  # few rows per part per batch
                        idx[j] = np.searchsorted(
                            wcum[lo[j]:hi[j]], r[j], side="right"
                        )
                    nxt[m] = nbrs[lo + idx]
                else:
                    deg = (offsets[pos + 1] - offsets[pos]).astype(
                        np.uint64)
                    idx = (h[m] % deg).astype(np.int64)
                    nxt[m] = nbrs[offsets[pos] + idx]
            return pa.table({"walk_id": wid, "v": nxt})

        cur = bucketed_group_combine(
            cur, ["v"], step_fn, num_buckets=P
        ).materialize()
        df = cur.to_pandas()
        out_frames.append(pd.DataFrame({
            "walk_id": df["walk_id"].to_numpy(),
            "step": np.full(len(df), t_step, np.int64),
            "vertex_id": df["v"].to_numpy(),
        }))

    out = pd.concat(out_frames, ignore_index=True)
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def node2vec_walks(edges_symmetric, length: int = 4, num_buckets: int = 32):
    """Second-order biased walks (Grover & Leskovec 2016 node2vec) with the
    fixed integer bias (p=2, q=0.5 scaled ×2): candidate weight 1 for
    returning to the previous vertex, 2 for a common neighbor of prev and
    cur (distance 1 from prev), 4 otherwise (distance 2 — the
    community-exploring setting). First hop is uniform (no prev). The
    seeded draw indexes the per-walk integer weight cumsum over the
    dst-sorted candidate list — deterministic, bit-reproducible, and
    value-exact vs the DuckDB twin (CASE weights + windowed SUM bracket).

    Same scale shape as random_walks (adjacency crosses once, steps
    exchange walk rows), plus each biased step reads the PREVIOUS vertex's
    neighbor list from the same partitioned CSR for the membership test."""
    P = num_buckets
    adj_index = _adjacency_index(edges_symmetric, P)
    adj_ref = ray.put(adj_index)

    @ray.remote
    def starts_of(block: pa.Table, row: int) -> np.ndarray:
        return block["srcs"][row].values.to_numpy(zero_copy_only=False)

    start_ids = np.unique(np.concatenate(
        ray.get([starts_of.remote(ref, row)
                 for ref, row in adj_index.values()])
    ))

    import ray.data as rd

    out_frames = [pd.DataFrame({
        "walk_id": start_ids,
        "step": np.zeros(len(start_ids), np.int64),
        "vertex_id": start_ids,
    })]

    def first_step(t: pa.Table) -> pa.Table:
        wid = t["walk_id"].to_numpy()
        v = t["v"].to_numpy()
        cache = PartCache(ray.get(adj_ref), ["srcs", "offsets", "nbrs"])
        nxt = np.empty(len(v), np.int64)
        parts = int_bucket(v, P)
        seeds = np.char.add(
            np.char.add(wid.astype(np.int64).astype("U"), ":"), "1")
        h = md5_u64(seeds.astype(object))
        for p in np.unique(parts):
            m = parts == p
            srcs, offsets, nbrs = cache.get(int(p))
            pos = np.searchsorted(srcs, v[m])
            deg = (offsets[pos + 1] - offsets[pos]).astype(np.uint64)
            idx = (h[m] % deg).astype(np.int64)
            nxt[m] = nbrs[offsets[pos] + idx]
        return pa.table({"walk_id": wid, "prev": v, "v": nxt})

    cur = bucketed_group_combine(
        rd.from_arrow(pa.table({"walk_id": start_ids, "v": start_ids})),
        ["v"], first_step, num_buckets=P,
    ).materialize()
    df = cur.to_pandas()
    out_frames.append(pd.DataFrame({
        "walk_id": df["walk_id"].to_numpy(),
        "step": np.ones(len(df), np.int64),
        "vertex_id": df["v"].to_numpy(),
    }))

    W_RET, W_COMMON, W_FAR = 1, 2, 4  # p=2, q=0.5, scaled x2

    for t_step in range(2, length + 1):
        def step_fn(t: pa.Table, _t_step=t_step) -> pa.Table:
            wid = t["walk_id"].to_numpy()
            prev = t["prev"].to_numpy()
            v = t["v"].to_numpy()
            cache = PartCache(ray.get(adj_ref), ["srcs", "offsets", "nbrs"])
            seeds = np.char.add(
                np.char.add(wid.astype(np.int64).astype("U"), ":"),
                f"{_t_step}",
            )
            h = md5_u64(seeds.astype(object))
            nxt = np.empty(len(v), np.int64)

            def nbrs_of(vertex: int):
                srcs, offsets, nbrs = cache.get(int(int_bucket(
                    np.array([vertex], np.int64), P)[0]))
                pos = int(np.searchsorted(srcs, vertex))
                return nbrs[offsets[pos]:offsets[pos + 1]]

            for j in range(len(v)):  # per-walk bias (candidate-set scale)
                cands = nbrs_of(int(v[j]))
                pn = nbrs_of(int(prev[j]))
                member = pn[np.minimum(np.searchsorted(pn, cands),
                                       len(pn) - 1)] == cands
                wgt = np.where(cands == prev[j], W_RET,
                               np.where(member, W_COMMON, W_FAR))
                cum = np.cumsum(wgt)
                r = int(h[j] % np.uint64(cum[-1]))
                nxt[j] = cands[int(np.searchsorted(cum, r, side="right"))]
            return pa.table({"walk_id": wid, "prev": v, "v": nxt})

        cur = bucketed_group_combine(cur, ["v"], step_fn,
                                     num_buckets=P).materialize()
        df = cur.to_pandas()
        out_frames.append(pd.DataFrame({
            "walk_id": df["walk_id"].to_numpy(),
            "step": np.full(len(df), t_step, np.int64),
            "vertex_id": df["v"].to_numpy(),
        }))

    out = pd.concat(out_frames, ignore_index=True)
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)
