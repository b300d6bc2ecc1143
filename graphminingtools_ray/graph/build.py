"""Edge-table derivation (SURVEY.md §2.11 "edge derivation", §7.1 step 1).

Two producers of the canonical ``edges(src, dst, weight[, kind])`` table:

- ``corpus_ingest``: the north-star path — Parquet corpus
  ``(repo, path, commit, lang, content)`` → sha256 invariant column →
  import / co-commit / shared-path edges (BASELINE.json north_star).
- ``copurchase_edges``: the same co-occurrence semantics over the
  driver-provided TPC-H-ish tables (parts co-occurring in an order), used by
  the driver-checked queries and the bench since ``/root/testdata`` is the
  mandated test input.

Pair expansion within a key group is the reference's "graphs that share a
key" notion; the quadratic blowup hazard on hub keys (SURVEY §7.4) is
handled by a deterministic per-group cap (sorted ids, first ``cap``),
documented as truncation semantics, not sampling.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

from ..functions.hashing import sha256_hex, stable_id64

_IMPORT_RE = re.compile(r"^import\s+(\S+)$", re.MULTILINE)
_PATH_RE = re.compile(r"^src/(pkg\d+)/(mod\d+)\.\w+$")


# ---------------------------------------------------------------------------
# vectorized all-pairs-within-groups
# ---------------------------------------------------------------------------

def pairs_within_lists(
    lists: pa.ChunkedArray | pa.Array, cap: int = 64, return_group_index: bool = False
):
    """Given an Arrow list<int64> column (one list per group), emit all
    unordered pairs (a < b) within each list, vectorized across groups.
    Returns (a, b) or, with ``return_group_index``, (a, b, group_row_index).

    Groups are size-capped deterministically: ids sorted ascending, first
    ``cap`` kept. Groups are processed in size classes so the pair-index
    template ``triu_indices(s, 1)`` is built once per distinct size —
    no per-group Python loop over elements.
    """
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = lists.values.to_numpy(zero_copy_only=False).astype(np.int64)

    # sort within each group (np.sort on segments via lexsort trick):
    # argsort (group_id, value) pairs — stable and fully vectorized
    n_groups = len(offsets) - 1
    sizes = np.diff(offsets)
    group_ids = np.repeat(np.arange(n_groups), sizes)
    order = np.lexsort((values, group_ids))
    values = values[order]
    group_ids = group_ids[order]

    # drop duplicate values within a group (distinct-pair semantics, matching
    # _pairs_from_sorted_key_items): sorted (group, value) rows → keep-first
    if len(values):
        keep = np.ones(len(values), dtype=bool)
        keep[1:] = (group_ids[1:] != group_ids[:-1]) | (values[1:] != values[:-1])
        if not keep.all():
            values = values[keep]
            sizes = np.bincount(group_ids[keep], minlength=n_groups).astype(np.int64)
            offsets = np.concatenate([[0], np.cumsum(sizes)])

    # apply cap: keep first `cap` of each (sorted) group
    if sizes.size and sizes.max() > cap:
        pos_in_group = np.arange(len(values)) - np.repeat(offsets[:-1], sizes)
        keep = pos_in_group < cap
        values = values[keep]
        sizes = np.minimum(sizes, cap)
        offsets = np.concatenate([[0], np.cumsum(sizes)])

    srcs, dsts, gids = [], [], []
    for s in np.unique(sizes):
        if s < 2:
            continue
        idx = np.flatnonzero(sizes == s)
        starts = offsets[idx]  # (g,)
        ii, jj = np.triu_indices(int(s), k=1)  # template, (p,)
        a = values[(starts[:, None] + ii[None, :]).ravel()]
        b = values[(starts[:, None] + jj[None, :]).ravel()]
        srcs.append(a)
        dsts.append(b)
        gids.append(np.repeat(idx, len(ii)))
    if not srcs:
        e = np.empty(0, np.int64)
        return (e, e, e) if return_group_index else (e, e)
    a = np.concatenate(srcs)
    b = np.concatenate(dsts)
    g = np.concatenate(gids)
    # lists were sorted, so a < b already except duplicates; drop a == b
    m = a != b
    if return_group_index:
        return a[m], b[m], g[m]
    return a[m], b[m]


def _pair_expand_batch(batch: pa.Table, list_col: str, cap: int) -> pa.Table:
    a, b = pairs_within_lists(batch[list_col], cap=cap)
    return pa.table({"src": a, "dst": b})


def _pairs_from_sorted_key_items(
    key: np.ndarray, items: np.ndarray, cap: int, return_keys: bool = False
):
    """All distinct unordered item pairs within each key group, given rows
    sorted by (key, item). Dedup + size-class expansion, fully vectorized.
    With ``return_keys``, also returns the group key of each pair."""
    if len(key) == 0:
        e = np.empty(0, np.int64)
        return (e, e, e) if return_keys else (e, e)
    # dedupe (key, item)
    keep = np.ones(len(key), dtype=bool)
    keep[1:] = (key[1:] != key[:-1]) | (items[1:] != items[:-1])
    key, items = key[keep], items[keep]
    # offsets per key
    starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
    offsets = np.concatenate([starts, [len(key)]]).astype(np.int64)
    sizes = np.diff(offsets)
    # apply cap (items sorted within key → keep first `cap`)
    if sizes.size and sizes.max() > cap:
        pos = np.arange(len(items)) - np.repeat(offsets[:-1], sizes)
        m = pos < cap
        items = items[m]
        key = key[m]
        sizes = np.minimum(sizes, cap)
        offsets = np.concatenate([[0], np.cumsum(sizes)])
    group_keys = key[offsets[:-1].clip(max=len(key) - 1)] if len(key) else key
    srcs, dsts, pkeys = [], [], []
    for s in np.unique(sizes):
        if s < 2:
            continue
        idx = np.flatnonzero(sizes == s)
        st = offsets[idx]
        ii, jj = np.triu_indices(int(s), k=1)
        srcs.append(items[(st[:, None] + ii[None, :]).ravel()])
        dsts.append(items[(st[:, None] + jj[None, :]).ravel()])
        if return_keys:
            pkeys.append(np.repeat(group_keys[idx], len(ii)))
    if not srcs:
        e = np.empty(0, np.int64)
        return (e, e, e) if return_keys else (e, e)
    a, b = np.concatenate(srcs), np.concatenate(dsts)
    if return_keys:
        return a, b, np.concatenate(pkeys)
    return a, b


def keyed_self_pairs(
    ds: rd.Dataset, key: str | list[str], item: str, cap: int = 64,
    num_buckets: int = 32, final_sum: bool = True, spread: bool = False,
) -> rd.Dataset:
    """(key, item) rows → unordered distinct-per-key pairs (src < dst) with
    ``weight`` = number of keys in which the pair co-occurred.

    Two hash-partitioned exchanges (functions.bucketing):
      1. bucket by co-occurrence KEY → per-bucket vectorized pair expansion
         (all keys of a bucket processed in one numpy pass, duplicate pairs
         pre-collapsed per bucket — the combiner half);
      2. bucket by (src, dst) → final weight sum.
    """
    from ..functions.bucketing import (
        bucketed_group_combine,
        count_distinct_rows,
        sum_by_int_keys,
    )

    keys = [key] if isinstance(key, str) else list(key)

    def expand_bucket(t: pa.Table) -> pa.Table:
        items = t[item].to_numpy()
        if len(keys) == 1:
            kcol = t[keys[0]]
            if pa.types.is_integer(kcol.type):
                k = kcol.to_numpy()
            else:
                # map string keys to dense ints within the bucket
                k = pa.compute.dictionary_encode(
                    kcol.combine_chunks()
                    if isinstance(kcol, pa.ChunkedArray) else kcol
                ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            packed = np.stack([t[c].to_numpy() for c in keys], axis=1)
            _, k = np.unique(packed, axis=0, return_inverse=True)
        order = np.lexsort((items, k))
        a, b = _pairs_from_sorted_key_items(k[order], items[order], cap)
        if len(a) == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.int64())}
            )
        return count_distinct_rows(["src", "dst"], "partial")(
            pa.table({"src": a, "dst": b})
        )

    pairs = bucketed_group_combine(
        ds, keys, expand_bucket, num_buckets=num_buckets, spread=spread
    )
    if not final_sum:
        return pairs  # (src, dst, partial) — caller owns the final exchange
    return bucketed_group_combine(
        pairs,
        ["src", "dst"],
        sum_by_int_keys(["src", "dst"], "partial", out_value="weight"),
        num_buckets=num_buckets,
        coalesce=False,  # input = previous exchange's output, already bucket-width
    )


# ---------------------------------------------------------------------------
# TPC-H co-purchase graph (driver-checkable edge derivation)
# ---------------------------------------------------------------------------

def copurchase_edges(sf_dir: str, cap: int = 64) -> rd.Dataset:
    """Edges between parts that appear in the same order.

    ``edges(src: int64, dst: int64, weight: int64)`` with ``src < dst``;
    weight = number of distinct orders containing both parts. Oracle SQL:
    self-join of distinct (l_orderkey, l_partkey) on l_orderkey.
    """
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return keyed_self_pairs(li, "l_orderkey", "l_partkey", cap=cap)


def symmetrize(edges: rd.Dataset) -> rd.Dataset:
    """Undirected view: every (src,dst) also as (dst,src); weight preserved.

    Mirrors the reference's undirected loader adding both half-edges
    (``/root/reference/loading.c:407-425``)."""

    def both(batch: pa.Table) -> pa.Table:
        cols = {"src": pa.concat_arrays(
                    [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]),
                "dst": pa.concat_arrays(
                    [batch["dst"].combine_chunks(), batch["src"].combine_chunks()])}
        if "weight" in batch.column_names:
            w = batch["weight"].combine_chunks()
            cols["weight"] = pa.concat_arrays([w, w])
        return pa.table(cols)

    return edges.map_batches(both, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus ingest (north-star path)
# ---------------------------------------------------------------------------

class _IngestBatch:
    """Stateless parse stage: vertex ids + module keys + import targets (+
    the sha256 invariant when ``with_sha``), all per batch. Regexes compiled
    at module import. The edges path runs ``with_sha=False`` — it never
    consumes the digest, and skipping it keeps the all-commit-rows parse
    cheap (the ``files`` surface computes sha over its own scan)."""

    def __init__(self, with_sha: bool = True):
        self.with_sha = with_sha

    def __call__(self, batch: pa.Table) -> pa.Table:
        # the import scan reads EVERY content byte — it runs as one
        # vectorized polars (rust-regex) pass instead of a per-row Python
        # findall loop (semantics parity-tested incl. \s+-across-newline,
        # CRLF, trailing-space cases; was the dominant CPU of the whole
        # edge-derivation path). Only the tiny per-match strings ever see a
        # second regex (the prefix strip).
        import polars as pl

        df = pl.from_arrow(
            pa.table(
                {
                    "repo": batch["repo"],
                    "path": batch["path"],
                    "content": batch["content"],
                }
            )
        )
        vkey = df.select(
            (pl.col("repo") + ":" + pl.col("path")).alias("k")
        )["k"].to_list()
        vid = stable_id64(vkey)
        parsed = df.select(
            pl.col("path").str.extract(_PATH_RE.pattern, 1).alias("g1"),
            pl.col("path").str.extract(_PATH_RE.pattern, 2).alias("g2"),
            pl.col("content")
            .str.extract_all(r"(?m)^import\s+(\S+)$")
            .list.eval(pl.element().str.replace(r"^import\s+", ""))
            # comma-joined (module keys contain no commas): survives the
            # arrow->pandas->arrow round trip that list<string> does not
            .list.join(",")
            .fill_null("")
            .alias("imports"),
        ).with_columns(
            pl.when(pl.col("g1").is_null())
            .then(pl.lit(""))
            .otherwise(pl.col("g1") + "." + pl.col("g2"))
            .alias("module_key")
        )
        cols = {
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "lang": batch["lang"],
            "vertex_id": pa.array(vid),
            "module_key": parsed["module_key"].to_arrow().cast(pa.string()),
            "imports": parsed["imports"].to_arrow().cast(pa.string()),
        }
        if self.with_sha:
            cols["sha256"] = sha256_hex(batch["content"].to_pylist())
        return pa.table(cols)


def corpus_ingest(
    corpus: rd.Dataset,
    cap: int = 64,
    include_copath: bool = True,
    check_collisions: bool = False,
    max_targets_per_module: int = 32,
) -> dict[str, rd.Dataset]:
    """Corpus table → ``{"files", "vertices", "edges"}`` datasets.

    - ``files``: per (file, commit) row with sha256 + vertex_id (invariant
      check surface).
    - ``vertices``: distinct ``(vertex_id, repo, path)``; collision-checked
      downstream (a vertex_id mapping to 2 distinct keys is a hard error).
    - ``edges``: union of
        * ``import``  — file u imports module key defined by file v
          (directed u→v; cross-repo fanout on popular packages = hubs),
        * ``cocommit`` — files touched by the same (repo, commit),
        * ``copath``  — same path string across repos (shared-path).
      Schema ``(src, dst, weight: int64, kind: string)``.

    Round-2 scale shape (no driver-held winner map, no broadcast definition
    table): the full corpus is parsed ONCE in the map stage (sha256, module
    key, import list — parse CPU scales with cores), so the winner exchange
    keyed on ``vertex_id`` ships only the COMPACT parsed columns, never the
    raw content (shuffle bytes ~20× below corpus bytes; all commits of a
    file co-locate and the max-commit filter runs bucket-locally). The
    import join is a bucketed join keyed on ``module_key`` (definitions and
    import references meet in the same bucket; the per-module target cap is
    applied there too, since a module's definitions all share its bucket).
    """
    # ``files`` (per-commit sha256 rows) parses with the digest — built
    # lazily, consumed by the invariant surface only
    files = corpus.map_batches(
        _IngestBatch(with_sha=True), batch_format="pyarrow"
    ).select_columns(["repo", "path", "commit", "lang", "sha256", "vertex_id"])
    # edges path: ONE cheap content pass (no sha) → compact parse rows,
    # MATERIALIZED and reused by the winner exchange, the co-commit pair
    # stage and the copath stage — the corpus itself is read exactly twice
    # per full ingest (once here, once if `files` is consumed). The parse
    # table is ~5-10% of corpus bytes (content dropped), so the object store
    # holds/spills it comfortably at any scale.
    parsed = corpus.map_batches(
        _IngestBatch(with_sha=False), batch_format="pyarrow"
    ).materialize()
    slim = parsed.select_columns(["vertex_id", "repo", "path", "commit"])

    # one row per FILE (vertex): the corpus is commit-grained; graph semantics
    # are file-grained. Deterministic pick = lexicographically max commit
    # (defines which content version wins if a file changed across commits).
    # ONE hash-bucketed exchange keyed on vertex_id: all commit-versions of a
    # file co-locate and the max-commit filter runs bucket-locally on
    # dictionary codes — no winner map ever exists on the driver or in a
    # broadcast.
    from ..functions.bucketing import (
        bucketed_group_combine,
        count_distinct_rows,
        string_hash64,
    )

    def winner_filter(t: pa.Table) -> pa.Table:
        vid = t["vertex_id"].to_numpy()
        # commit strings → order-preserving dense codes (max code == max
        # string): Arrow dictionary-encode, then rank only the (small)
        # dictionary — no per-row Python strings
        col = t["commit"]
        enc = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
               else col).dictionary_encode()
        dict_vals = enc.dictionary.to_numpy(zero_copy_only=False)
        rank = np.empty(len(dict_vals), np.int64)
        rank[np.argsort(dict_vals, kind="stable")] = np.arange(len(dict_vals))
        codes = rank[enc.indices.to_numpy(zero_copy_only=False)]
        order = np.lexsort((codes, vid))
        svid, scodes = vid[order], codes[order]
        last = np.ones(len(svid), dtype=bool)
        last[:-1] = svid[1:] != svid[:-1]  # last row of each vid run = max code
        # propagate each run's max code to all its rows
        run_id = np.cumsum(np.concatenate([[0], (svid[1:] != svid[:-1]).astype(np.int64)]))
        run_max = np.zeros(run_id[-1] + 1 if len(run_id) else 0, dtype=np.int64)
        if len(run_id):
            run_max[run_id[last]] = scodes[last]
        winner_mask_sorted = scodes == run_max[run_id] if len(run_id) else np.zeros(0, bool)
        mask = np.zeros(len(vid), dtype=bool)
        mask[order] = winner_mask_sorted
        return t.filter(pa.array(mask))

    distinct_files = bucketed_group_combine(
        parsed, ["vertex_id"], winner_filter
    ).materialize()

    vertices = distinct_files.select_columns(["vertex_id", "repo", "path"])

    if check_collisions:
        n_distinct_keys = (
            slim.groupby(["repo", "path"]).aggregate(Count(alias_name="_c")).count()
        )
        n_distinct_ids = distinct_files.count()
        if n_distinct_keys != n_distinct_ids:
            raise RuntimeError(
                f"vertex_id hash collision: {n_distinct_keys} distinct repo:path "
                f"keys -> {n_distinct_ids} distinct vertex ids"
            )

    # --- import edges (bucketed join on module_key — no broadcast side) ----
    # Definitions and import references meet in the hash bucket of their
    # module_key; the hub cap (a module defined in thousands of files — the
    # stdio.h effect) is applied inside the bucket, where ALL of a module's
    # definitions live: deterministic first `max_targets_per_module` sorted
    # target ids (truncation semantics, like the pair-expansion cap).
    # module_key crosses the exchange as an int64 hash (string_hash64):
    # the key is EPHEMERAL (edges are (src, dst) — the string never reaches
    # the output), so fixed-width ints halve the shuffle bytes and keep the
    # bucket combine pure-numpy; collision semantics documented on the helper
    def def_rows(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["module_key"], "")
        t = t.filter(keep)
        return pa.table(
            {
                "mk": pa.array(string_hash64(t["module_key"])),
                "vid": t["vertex_id"],
                "is_def": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    def import_rows(t: pa.Table) -> pa.Table:
        src_ids = t["vertex_id"].to_numpy()
        col = t["imports"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # split the comma-joined import list arrow-side, flatten, hash
        lists = pc.split_pattern(col, ",")
        flat = lists.flatten()
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        # empty imports string splits to [""] — drop those rows by masking
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat_src = np.repeat(src_ids, counts)[mask]
        return pa.table(
            {
                "mk": pa.array(string_hash64(flat.filter(pa.array(mask)))),
                "vid": pa.array(flat_src),
                "is_def": pa.array(np.zeros(len(flat_src), np.int8)),
            }
        )

    _empty_pairs = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
         "partial": pa.array([], pa.int64())}
    )

    def join_imports(t: pa.Table) -> pa.Table:
        # the ref⋈def equi-join on the int64 module hash is a searchsorted
        # segment expansion over the hash-sorted capped defs — no string
        # merge, no pandas
        codes = t["mk"].to_numpy()
        vid = t["vid"].to_numpy()
        is_def = t["is_def"].to_numpy(zero_copy_only=False).astype(bool)
        dc, dv = codes[is_def], vid[is_def]
        order = np.lexsort((dv, dc))
        dc, dv = dc[order], dv[order]
        if len(dc):
            # cap: first `max_targets_per_module` dst ids (ascending) per
            # module — same truncation semantics as the pair-expansion cap
            flag = np.zeros(len(dc), bool)
            flag[0] = True
            flag[1:] = dc[1:] != dc[:-1]
            starts = np.flatnonzero(flag)
            run_id = np.cumsum(flag) - 1
            keep = (np.arange(len(dc)) - starts[run_id]) < max_targets_per_module
            dc, dv = dc[keep], dv[keep]
        rc, rv = codes[~is_def], vid[~is_def]
        lo = np.searchsorted(dc, rc, side="left")
        hi = np.searchsorted(dc, rc, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return _empty_pairs
        a = np.repeat(rv, cnt)
        seg_start = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        b = dv[np.repeat(lo - seg_start, cnt) + np.arange(total)]
        m = a != b
        return count_distinct_rows(["src", "dst"], "partial")(
            pa.table({"src": a[m], "dst": b[m]})
        )

    defs_ds = distinct_files.select_columns(
        ["module_key", "vertex_id"]
    ).map_batches(def_rows, batch_format="pyarrow")
    refs_ds = distinct_files.select_columns(
        ["vertex_id", "imports"]
    ).map_batches(import_rows, batch_format="pyarrow")
    # kind travels as an int8 code through the exchanges (strings would
    # dominate the shuffle bytes of the slim pair rows); decoded to the
    # public string column after the final sum
    _KINDS = ("import", "cocommit", "copath")

    def _append_kind(code: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "kind_code", pa.array(np.full(t.num_rows, code, np.int8))
            )
        return fn

    import_partials = bucketed_group_combine(
        defs_ds.union(refs_ds), ["mk"], join_imports, coalesce=False
    ).map_batches(_append_kind(0), batch_format="pyarrow")

    # --- co-commit edges (from the slim projection — no content read) ------
    # ckey is likewise ephemeral → int64 hash through the exchange
    cc_in = slim.map_batches(
        lambda t: pa.table(
            {
                "ckey": pa.array(string_hash64(
                    pc.binary_join_element_wise(t["repo"], t["commit"], "@")
                )),
                "vertex_id": t["vertex_id"],
            }
        ),
        batch_format="pyarrow",
    )
    cocommit_partials = keyed_self_pairs(
        cc_in, "ckey", "vertex_id", cap=cap, final_sum=False
    ).map_batches(_append_kind(1), batch_format="pyarrow")

    parts = [import_partials, cocommit_partials]

    # --- shared-path edges -------------------------------------------------
    if include_copath:
        cp_in = slim.map_batches(
            lambda t: pa.table(
                {
                    "pkey": pa.array(string_hash64(t["path"])),
                    "vertex_id": t["vertex_id"],
                }
            ),
            batch_format="pyarrow",
        )
        parts.append(
            keyed_self_pairs(
                cp_in, "pkey", "vertex_id", cap=cap, final_sum=False
            ).map_batches(_append_kind(2), batch_format="pyarrow")
        )

    # ONE final weight-sum exchange for all edge kinds together
    # (lexsort + reduceat over (src, dst, kind_code) — exact int64 sums,
    # canonical order; kind decoded to its public string via a 3-entry
    # dictionary cast, no per-row Python)
    def sum_per_kind(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        kc = t["kind_code"].to_numpy(zero_copy_only=False)
        v = t["partial"].to_numpy()
        if not len(src):
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "weight": pa.array([], pa.int64()),
                 "kind": pa.array([], pa.string())}
            )
        order = np.lexsort((kc, dst, src))
        s, d, k2, vv = src[order], dst[order], kc[order], v[order]
        flag = np.zeros(len(s), bool)
        flag[0] = True
        flag[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1]) | (k2[1:] != k2[:-1])
        starts = np.flatnonzero(flag)
        kind = pa.DictionaryArray.from_arrays(
            pa.array(k2[starts].astype(np.int32)), pa.array(list(_KINDS))
        ).cast(pa.string())
        return pa.table(
            {
                "src": s[starts],
                "dst": d[starts],
                "weight": np.add.reduceat(vv.astype(np.int64), starts),
                "kind": kind,
            }
        )

    edges = bucketed_group_combine(
        parts[0].union(*parts[1:]), ["src", "dst"], sum_per_kind,
        coalesce=False,  # inputs are previous exchanges' bucket-width outputs
    )
    return {"files": files, "vertices": vertices, "edges": edges}
