"""Deterministic random-walk corpus generation (DeepWalk / node2vec-style
walk sampling — the link-graph training-data op that feeds embedding
models; Perozzi et al. 2014).

One walk per start vertex, L steps. The next-hop choice is a DETERMINISTIC
seeded hash — neighbor index = md5_u64("{walk_id}:{step}") mod degree over
the dst-sorted neighbor list — so the walk corpus is reproducible
bit-for-bit across runs AND value-exact against a DuckDB twin
(md5_number_lower + ROW_NUMBER over the same neighbor order), unlike PRNG
walks whose stream depends on scheduling.

Scale shape (cluster-shaped end to end; nothing vertex- or edge-scale ever
lands on the driver):

- the adjacency crosses the wire ONCE into a hash-partitioned CSR index in
  the object store (per-part: sorted srcs, dst-sorted neighbor lists,
  offsets — the triangles probe-index pattern);
- the START rows are derived as a Dataset by mapping over the CSR part
  blocks (each part's ``srcs`` inventory IS the start set — parts are
  disjoint, so no driver concat/unique);
- each step exchanges only the WALK rows (walk-scale, not edge-scale)
  keyed on the current vertex, and the per-bucket step function reads its
  partition's CSR zero-copy and picks next hops with VECTORIZED kernels
  (global-cumsum searchsorted for weighted picks; flat candidate arrays +
  batched bisection for the node2vec bias — no per-row Python);
- the walk corpus is assembled as a UNION of per-step Datasets over the
  already-materialized step blocks and returned as a Dataset — the caller
  sinks it (``write_parquet``) or, at gate scale only, ``to_pandas()``.

L steps = L walk-scale exchanges + 1 edge-scale index build.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
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
    dst-sorted per src, offsets; with ``weighted`` also the part-GLOBAL
    inclusive weight cumsum — globally nondecreasing, so a weighted pick
    is ONE vectorized searchsorted per batch) in the object store.
    Returns ``(index, parts_ds)``: the driver-held ``{part: (ref, row)}``
    index plus the materialized parts Dataset (start rows derive from it
    distributed)."""

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
        # (s, d) order via ONE packed-key stable (radix) argsort when the
        # ids fit — the 2-key lexsort was the dominant cost of the whole
        # walk-index build at 10^9 half-edges (the steps themselves are
        # walk-scale and nearly free)
        if len(s) and int(s.min()) >= 0 and int(d.min()) >= 0 and \
                int(d.max()) + 1 < (1 << 62) // (int(s.max()) + 1):
            order = np.argsort(s * np.int64(int(d.max()) + 1) + d,
                               kind="stable")
        else:
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
            # nb carries the partition count the index was built with, so a
            # walk call with a different num_buckets can't silently route
            # vertices to the wrong CSR part (_check_index derives P from it)
            "nb": pa.array([P], pa.int64()),
            "srcs": pa.array([srcs], pa.list_(pa.int64())),
            "offsets": pa.array([offsets], pa.list_(pa.int64())),
            "nbrs": pa.array([d], pa.list_(pa.int64())),
        }
        if weighted:
            # part-global inclusive cumsum (NOT reset per src): within a
            # src's slice [lo, hi) the within-src cum is wcum - wcum[lo-1],
            # and global monotonicity makes the pick one searchsorted
            cols["wcum"] = pa.array([np.cumsum(w[keep])], pa.list_(pa.int64()))
        return pa.table(cols)

    ds = partition_group_combine(
        edges_symmetric.map_batches(add_part, batch_format="pyarrow"),
        "part", P, build_csr,
    ).materialize()
    index, _ = index_state(ds)
    return index, ds


def _starts_dataset(parts_ds):
    """(walk_id, v) start rows — one per vertex — as a Dataset mapped from
    the CSR part blocks (parts partition the vertex set, srcs are sorted
    unique per part; nothing reaches the driver)."""

    def extract(t: pa.Table) -> pa.Table:
        srcs = t["srcs"].combine_chunks()
        flat = srcs.flatten()
        return pa.table({"walk_id": flat, "v": flat})

    return parts_ds.map_batches(extract, batch_format="pyarrow")


def _emit_step(ds, step: int):
    """Lazy per-step projection of a materialized (walk_id, ..., v) step
    Dataset into corpus rows (walk_id, step, vertex_id)."""

    def project(t: pa.Table, _s=step) -> pa.Table:
        return pa.table({
            "walk_id": t["walk_id"].combine_chunks(),
            "step": pa.array(np.full(t.num_rows, _s, np.int64)),
            "vertex_id": t["v"].combine_chunks(),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def _seed_hash(wid: np.ndarray, step: int) -> np.ndarray:
    """uint64 md5_number_lower('{walk_id}:{step}') per row."""
    seeds = np.char.add(
        np.char.add(wid.astype(np.int64).astype("U"), ":"), f"{step}"
    )
    return md5_u64(seeds.astype(object))


def _slice_bounds(entry, v: np.ndarray):
    """(lo, hi) neighbor-slice bounds of each vertex in its part's CSR."""
    srcs, offsets = entry[0], entry[1]
    pos = np.searchsorted(srcs, v)
    return offsets[pos], offsets[pos + 1]


def _uniform_next(cache: PartCache, v: np.ndarray, h: np.ndarray,
                  P: int) -> np.ndarray:
    """Vectorized uniform seeded pick: index = h mod degree into the
    dst-sorted neighbor list."""
    nxt = np.empty(len(v), np.int64)
    parts = int_bucket(v, P)
    for p in np.unique(parts):
        m = parts == p
        entry = cache.get(int(p))
        lo, hi = _slice_bounds(entry, v[m])
        deg = (hi - lo).astype(np.uint64)
        idx = (h[m] % deg).astype(np.int64)
        nxt[m] = entry[2][lo + idx]
    return nxt


def _weighted_next(cache: PartCache, v: np.ndarray, h: np.ndarray,
                   P: int) -> np.ndarray:
    """Vectorized weight-proportional pick: r = h mod W(v); first neighbor
    whose within-src inclusive cumsum exceeds r — ONE searchsorted over the
    part-global cumsum per part group (no per-row loop)."""
    nxt = np.empty(len(v), np.int64)
    parts = int_bucket(v, P)
    for p in np.unique(parts):
        m = parts == p
        srcs, offsets, nbrs, wcum = cache.get(int(p))
        lo, hi = _slice_bounds((srcs, offsets), v[m])
        base = np.where(lo > 0, wcum[np.maximum(lo - 1, 0)], 0)
        W = (wcum[hi - 1] - base).astype(np.uint64)
        r = (h[m] % W).astype(np.int64)
        # global cumsum is strictly increasing (weights >= 1), so the
        # within-slice bracket cum - w <= r < cum is the first global
        # position with wcum > base + r
        nxt[m] = nbrs[np.searchsorted(wcum, base + r, side="right")]
    return nxt


def _check_index(parts_ds, weighted: bool, num_buckets: int) -> int:
    """Fail at CALL time (not deep inside a remote step task) when a
    prebuilt index's weighted-ness doesn't match the walk's, and return the
    partition count the index was BUILT with (its ``nb`` column) — an index
    built with num_buckets=64 used by a walk routing with P=32 would
    silently read the wrong CSR part's neighbor slices. The caller's
    ``num_buckets`` is overridden by the index's own value."""
    names = parts_ds.schema().names
    has_w = "wcum" in names
    if weighted and not has_w:
        raise ValueError(
            "weighted walk needs an index built with "
            "build_walk_index(..., weighted=True)"
        )
    if not weighted and has_w:
        raise ValueError(
            "unweighted walk passed a WEIGHTED index; rebuild with "
            "build_walk_index(..., weighted=False)"
        )
    if "nb" in names:
        rows = parts_ds.select_columns(["nb"]).take(1)
        if rows:
            return int(rows[0]["nb"])
    return num_buckets


def build_walk_index(edges_symmetric, num_buckets: int = 32,
                     weighted: bool = False):
    """Public handle on the one edge-scale step: build the partitioned CSR
    walk index ONCE and reuse it across walk jobs over the same graph
    (``random_walks(..., index=...)`` / ``node2vec_walks(..., index=...)``
    skip the rebuild). Returns an opaque (driver_index, parts_dataset)
    pair; the adjacency lives in the object store."""
    return _adjacency_index(edges_symmetric, num_buckets, weighted=weighted)


def random_walks(edges_symmetric=None, length: int = 4, num_buckets: int = 32,
                 weighted: bool = False, index=None):
    """-> ray.data.Dataset (walk_id, step, vertex_id): one deterministic
    L-step walk per start vertex of the simple symmetric graph.
    ``edges_symmetric`` must contain both half-edges, so every visited
    vertex has at least one neighbor. With ``weighted`` the transition is
    proportional to the integer edge weight: the seeded draw indexes the
    per-src inclusive weight cumsum (r = md5 mod W(v), first neighbor with
    cum > r) — still deterministic and SQL-exact. The result streams —
    sink it or ``to_pandas()`` only at gate scale.

    With a prebuilt ``index`` (build_walk_index), ``edges_symmetric`` may be
    omitted and ``num_buckets`` is taken from the index itself."""
    P = num_buckets
    if index is not None:
        adj_index, parts_ds = index
        P = _check_index(parts_ds, weighted, P)
    elif edges_symmetric is None:
        raise ValueError("random_walks needs edges_symmetric or index")
    else:
        adj_index, parts_ds = _adjacency_index(edges_symmetric, P,
                                               weighted=weighted)
    adj_ref = ray.put(adj_index)
    cols = (["srcs", "offsets", "nbrs", "wcum"] if weighted
            else ["srcs", "offsets", "nbrs"])

    starts = _starts_dataset(parts_ds)
    outs = [_emit_step(starts, 0)]
    cur = starts

    for t_step in range(1, length + 1):
        def step_fn(t: pa.Table, _t_step=t_step) -> pa.Table:
            wid = t["walk_id"].to_numpy()
            v = t["v"].to_numpy()
            cache = PartCache(ray.get(adj_ref), cols)
            h = _seed_hash(wid, _t_step)
            nxt = (_weighted_next(cache, v, h, P) if weighted
                   else _uniform_next(cache, v, h, P))
            return pa.table({"walk_id": wid, "v": nxt})

        cur = bucketed_group_combine(
            cur, ["v"], step_fn, num_buckets=P
        ).materialize()
        outs.append(_emit_step(cur, t_step))

    return reduce(lambda a, b: a.union(b), outs)


def node2vec_walks(edges_symmetric=None, length: int = 4, num_buckets: int = 32,
                   index=None):
    """Second-order biased walks (Grover & Leskovec 2016 node2vec) with the
    fixed integer bias (p=2, q=0.5 scaled ×2): candidate weight 1 for
    returning to the previous vertex, 2 for a common neighbor of prev and
    cur (distance 1 from prev), 4 otherwise (distance 2 — the
    community-exploring setting). First hop is uniform (no prev). The
    seeded draw indexes the per-walk integer weight cumsum over the
    dst-sorted candidate list — deterministic, bit-reproducible, and
    value-exact vs the DuckDB twin (CASE weights + windowed SUM bracket).

    Same scale shape as random_walks (adjacency crosses once, steps
    exchange walk rows, output unioned as a Dataset), plus each biased
    step reads the PREVIOUS vertex's neighbor list from the same
    partitioned CSR for the membership test. The bias is computed on FLAT
    candidate arrays (repeat/cumsum offsets + batched bisection into the
    prev slices + one global-cumsum searchsorted per group) — no per-walk
    Python loop."""
    P = num_buckets
    if index is not None:
        adj_index, parts_ds = index
        P = _check_index(parts_ds, weighted=False, num_buckets=P)
    elif edges_symmetric is None:
        raise ValueError("node2vec_walks needs edges_symmetric or index")
    else:
        adj_index, parts_ds = _adjacency_index(edges_symmetric, P)
    adj_ref = ray.put(adj_index)

    starts = _starts_dataset(parts_ds)
    outs = [_emit_step(starts, 0)]

    def first_step(t: pa.Table) -> pa.Table:
        wid = t["walk_id"].to_numpy()
        v = t["v"].to_numpy()
        cache = PartCache(ray.get(adj_ref), ["srcs", "offsets", "nbrs"])
        nxt = _uniform_next(cache, v, _seed_hash(wid, 1), P)
        return pa.table({"walk_id": wid, "prev": v, "v": nxt})

    cur = bucketed_group_combine(
        starts, ["v"], first_step, num_buckets=P,
    ).materialize()
    outs.append(_emit_step(cur, 1))

    for t_step in range(2, length + 1):
        def step_fn(t: pa.Table, _t_step=t_step) -> pa.Table:
            wid = t["walk_id"].to_numpy()
            prev = t["prev"].to_numpy()
            v = t["v"].to_numpy()
            cache = PartCache(ray.get(adj_ref), ["srcs", "offsets", "nbrs"])
            nxt = _node2vec_next(cache, prev, v, _seed_hash(wid, _t_step), P)
            return pa.table({"walk_id": wid, "prev": v, "v": nxt})

        cur = bucketed_group_combine(cur, ["v"], step_fn,
                                     num_buckets=P).materialize()
        outs.append(_emit_step(cur, t_step))

    return reduce(lambda a, b: a.union(b), outs)


_W_RET, _W_COMMON, _W_FAR = 1, 2, 4  # p=2, q=0.5, scaled x2


def _node2vec_next(cache: PartCache, prev: np.ndarray, v: np.ndarray,
                   h: np.ndarray, P: int) -> np.ndarray:
    """Vectorized second-order biased pick (the node2vec step kernel shared
    by the streaming and checkpointed paths)."""
    nxt = np.empty(len(v), np.int64)
    # group rows by (part(v), part(prev)) so both CSR lookups are against
    # ONE part's flat arrays per group — everything inside a group is
    # vectorized over the flattened candidate lists
    gkey = int_bucket(v, P) * P + int_bucket(prev, P)
    for g in np.unique(gkey):
        m = gkey == g
        srcs_v, off_v, nbrs_v = cache.get(int(g) // P)
        srcs_p, off_p, nbrs_p = cache.get(int(g) % P)
        lo, hi = _slice_bounds((srcs_v, off_v), v[m])
        deg = hi - lo
        n_flat = int(deg.sum())
        starts_f = np.cumsum(deg) - deg  # per-row flat start
        # flat candidate positions: row j contributes lo[j]..hi[j]
        fp = (np.repeat(lo - starts_f, deg)
              + np.arange(n_flat, dtype=np.int64))
        cand = nbrs_v[fp]
        prev_f = np.repeat(prev[m], deg)
        # membership of cand in prev's dst-sorted neighbor slice:
        # batched lower-bound bisection (log(max prev degree)
        # vectorized rounds — no per-row searchsorted)
        pos_p = np.searchsorted(srcs_p, prev[m])
        lb = np.repeat(off_p[pos_p], deg)
        ub = np.repeat(off_p[pos_p + 1], deg)
        phi = ub.copy()
        while True:
            act = lb < ub
            if not act.any():
                break
            mid = (lb + ub) >> 1
            less = np.zeros(len(lb), bool)
            less[act] = nbrs_p[mid[act]] < cand[act]
            lb = np.where(act & less, mid + 1, lb)
            ub = np.where(act & ~less, mid, ub)
        safe = np.minimum(lb, len(nbrs_p) - 1)
        member = (lb < phi) & (nbrs_p[safe] == cand)
        wgt = np.where(cand == prev_f, _W_RET,
                       np.where(member, _W_COMMON, _W_FAR))
        cs = np.cumsum(wgt)
        base = np.where(starts_f > 0,
                        cs[np.maximum(starts_f - 1, 0)], 0)
        tot = (cs[starts_f + deg - 1] - base).astype(np.uint64)
        r = (h[m] % tot).astype(np.int64)
        # cs strictly increasing (weights >= 1): first candidate
        # whose per-walk inclusive cum exceeds r
        nxt[m] = cand[np.searchsorted(cs, base + r, side="right")]
    return nxt


# ---------------------------------------------------------------------------
# Resumable walk corpus: per-step parquet shards + manifest-last commit.
# ---------------------------------------------------------------------------


def _index_digest(parts_ds) -> str:
    """Deterministic digest of the partitioned CSR index (order-free sum of
    per-part blake2 over the packed arrays) — keys the walk checkpoint to
    the GRAPH, so a resume against different edges fails loudly instead of
    splicing two walks together."""
    import hashlib

    def part_digest(t: pa.Table) -> pa.Table:
        vals = []
        # every list column present is hashed — including wcum on weighted
        # indexes, so same-topology-different-weights graphs get different
        # digests
        cols = [c for c in ("srcs", "offsets", "nbrs", "wcum")
                if c in t.column_names]
        for row in range(t.num_rows):
            h = hashlib.blake2b(digest_size=8)
            h.update(int(t["part"][row].as_py()).to_bytes(8, "little"))
            for col in cols:
                arr = t[col][row].values.to_numpy(zero_copy_only=False)
                h.update(np.ascontiguousarray(arr, np.int64).tobytes())
            vals.append(int.from_bytes(h.digest(), "little"))
        return pa.table({"d": pa.array(vals, pa.uint64())})

    total = 0
    for b in parts_ds.map_batches(
        part_digest, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        total = (total + int(np.sum(b["d"].to_numpy(), dtype=np.uint64))) \
            % (1 << 64)
    return f"{total:016x}"


def random_walks_checkpointed(
    edges_symmetric, checkpoint_dir: str, length: int = 4,
    num_buckets: int = 32, weighted: bool = False, node2vec: bool = False,
):
    """``random_walks`` with per-STEP checkpointing: each step's walk state
    (walk_id, v) lands as parquet under ``checkpoint_dir/step=t/`` with a
    manifest-last commit, so a killed run re-run with the same arguments
    resumes after the last committed step (the walk is deterministic given
    the graph — the seeded next-hop depends only on (walk_id, step) — so a
    resumed corpus is bit-identical to an uninterrupted one; pytest-pinned).
    The manifest is keyed on the CSR index digest + parameters; a mismatch
    raises instead of silently splicing different walks.

    Returns the corpus Dataset (walk_id, step, vertex_id); completed steps
    stream straight from their parquet shards."""
    import json
    import os

    P = num_buckets
    mode = ("node2vec" if node2vec
            else "weighted" if weighted else "uniform")
    if node2vec and weighted:
        raise ValueError("node2vec and weighted are mutually exclusive")
    os.makedirs(checkpoint_dir, exist_ok=True)
    man_path = os.path.join(checkpoint_dir, "manifest.json")
    old = None
    if os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        # parameter guards fire BEFORE the (expensive) index build
        for k, cur_v in (("mode", mode), ("P", P)):
            if old.get(k, "uniform" if k == "mode" else None) != cur_v:
                raise ValueError(
                    f"walk checkpoint {checkpoint_dir} was written for "
                    f"{k}={old.get(k)!r}, current run has {cur_v!r}; "
                    "use a fresh checkpoint_dir"
                )

    adj_index, parts_ds = _adjacency_index(edges_symmetric, P,
                                           weighted=weighted)
    adj_ref = ray.put(adj_index)
    cols = (["srcs", "offsets", "nbrs", "wcum"] if weighted
            else ["srcs", "offsets", "nbrs"])
    digest = _index_digest(parts_ds)
    manifest = {"digest": digest, "mode": mode, "P": P,
                "completed": []}
    if old is not None:
        if old.get("digest") != digest:
            raise ValueError(
                f"walk checkpoint {checkpoint_dir} was written for a "
                f"different graph (digest {old.get('digest')!r} != "
                f"{digest!r}); use a fresh checkpoint_dir"
            )
        manifest = old

    def commit(step: int) -> None:
        manifest["completed"] = sorted(set(manifest["completed"]) | {step})
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, man_path)  # manifest-last: shards are durable first

    import ray.data as rd

    starts = _starts_dataset(parts_ds)
    outs = [_emit_step(starts, 0)]
    cur = starts
    done = set(manifest["completed"])

    import shutil

    for t_step in range(1, length + 1):
        step_dir = os.path.join(checkpoint_dir, f"step={t_step}")
        if t_step in done:
            cur = rd.read_parquet(step_dir)
        else:
            # a killed attempt may have left partial shards (parquet writes
            # never overwrite — a rewrite into a dirty dir would read back
            # stale + new shards as duplicated walk state): write to a tmp
            # dir and rename into place, clearing any leftovers first
            tmp_dir = step_dir + ".tmp"
            shutil.rmtree(tmp_dir, ignore_errors=True)
            shutil.rmtree(step_dir, ignore_errors=True)
            def step_fn(t: pa.Table, _t_step=t_step) -> pa.Table:
                wid = t["walk_id"].to_numpy()
                v = t["v"].to_numpy()
                cache = PartCache(ray.get(adj_ref), cols)
                h = _seed_hash(wid, _t_step)
                if node2vec:
                    # first hop uniform (no prev), then the biased kernel;
                    # the state rows carry prev for the membership test
                    if _t_step == 1:
                        nxt = _uniform_next(cache, v, h, P)
                    else:
                        nxt = _node2vec_next(
                            cache, t["prev"].to_numpy(), v, h, P
                        )
                    return pa.table(
                        {"walk_id": wid, "prev": v, "v": nxt}
                    )
                nxt = (_weighted_next(cache, v, h, P) if weighted
                       else _uniform_next(cache, v, h, P))
                return pa.table({"walk_id": wid, "v": nxt})

            cur = bucketed_group_combine(
                cur, ["v"], step_fn, num_buckets=P
            )
            cur.write_parquet(tmp_dir)
            os.rename(tmp_dir, step_dir)
            cur = rd.read_parquet(step_dir)
            commit(t_step)
        outs.append(_emit_step(cur, t_step))

    return reduce(lambda a, b: a.union(b), outs)


def skipgram_pairs(corpus, window: int = 2, neg: int = 2,
                   neg_vertices=None, num_buckets: int = 32):
    """Skip-gram training pairs from a walk corpus — the link between the
    walk family and an embedding trainer (word2vec-style, Mikolov et al.
    2013): for every walk position, each other position within ``window``
    steps becomes a positive (center, context) pair, plus ``neg``
    md5-deterministic negative samples per position.

    ``corpus`` is a (walk_id, step, vertex_id) Dataset (random_walks /
    node2vec_walks output). ONE walk-scale exchange keyed on walk_id
    co-locates each walk's rows; pair emission is vectorized per bucket
    (position arithmetic over the (walk_id, step)-sorted arrays — no
    per-walk Python). Negatives draw from the sorted distinct walk-id
    universe (== the start-vertex set): index =
    md5_number_lower('{walk_id}:{step}:n{j}') mod |universe| — the draw is
    SQL-replicable and independent of partitioning. The universe array is
    broadcast once via ``ray.put`` (vertex-scale: at 10^9-vertex scale
    precompute it once per graph and share across jobs, or set neg=0 and
    sample negatives downstream).

    Returns a Dataset (walk_id, center_step, center, context_step,
    context, label) with label 1 for window pairs, 0 for negatives
    (negatives carry context_step = -j)."""
    if neg_vertices is None and neg > 0:
        # distinct walk ids == step-0 rows (one per walk, already distinct)
        parts = []
        for b in (
            corpus.filter(expr="step == 0")
            .select_columns(["vertex_id"])
            .iter_batches(batch_format="pyarrow")
        ):
            parts.append(b["vertex_id"].to_numpy())
        neg_vertices = np.concatenate(parts) if parts else np.empty(0, np.int64)
    # np.unique also normalizes caller-supplied universes: the md5-rank
    # contract (and the SQL twin's ROW_NUMBER) is over the SORTED DISTINCT
    # vertex set, so an unsorted/duplicated precomputed array must not
    # silently shift the draw
    uni_ref = ray.put(np.unique(np.asarray(neg_vertices, np.int64))
                      if neg > 0 else np.empty(0, np.int64))

    def pairs_fn(t: pa.Table) -> pa.Table:
        wid = t["walk_id"].to_numpy()
        step = t["step"].to_numpy()
        v = t["vertex_id"].to_numpy()
        order = np.lexsort((step, wid))
        wid, step, v = wid[order], step[order], v[order]
        cols = {k: [] for k in ("walk_id", "center_step", "center",
                                "context_step", "context", "label")}
        for d in range(1, window + 1):
            if len(wid) <= d:
                break
            m = (wid[d:] == wid[:-d]) & (step[d:] - step[:-d] == d)
            i = np.flatnonzero(m)
            # both directions: (earlier, later) and (later, earlier)
            cols["walk_id"] += [wid[i], wid[i]]
            cols["center_step"] += [step[i], step[i + d]]
            cols["center"] += [v[i], v[i + d]]
            cols["context_step"] += [step[i + d], step[i]]
            cols["context"] += [v[i + d], v[i]]
            cols["label"] += [np.ones(len(i), np.int64)] * 2
        uni = ray.get(uni_ref)
        if neg > 0 and len(uni) and len(wid):
            n = np.uint64(len(uni))
            base = np.char.add(
                np.char.add(wid.astype("U"), ":"), step.astype("U")
            )
            for j in range(1, neg + 1):
                seeds = np.char.add(base, f":n{j}").astype(object)
                idx = (md5_u64(seeds) % n).astype(np.int64)
                cols["walk_id"].append(wid)
                cols["center_step"].append(step)
                cols["center"].append(v)
                cols["context_step"].append(np.full(len(wid), -j, np.int64))
                cols["context"].append(uni[idx])
                cols["label"].append(np.zeros(len(wid), np.int64))
        if not cols["walk_id"]:
            return pa.table(
                {k: pa.array([], pa.int64()) for k in cols}
            )
        return pa.table(
            {k: np.concatenate(arrs) for k, arrs in cols.items()}
        )

    return bucketed_group_combine(
        corpus, ["walk_id"], pairs_fn, num_buckets=num_buckets
    )
