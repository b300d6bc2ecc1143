"""Feature-table utilities over the sparse (graph_id, pattern_id, pattern)
long form — the engine analog of the reference's post-kernel Python layer
(``/root/reference/python/mergeSparseFeatureFiles.py``: hstack two libSVM
feature matrices; ``/root/reference/python/selectTopFeatures.py``: chi2
scoring + top-percentile selection).

Scale shape: the PATTERN space is small by construction (it is a mined
frequent set), so per-pattern aggregates are driver-safe; everything keyed
on graph_id (corpus-scale) moves through ONE bucketed exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.bucketing import bucketed_group_combine
from ..functions.rounding import round_half_away


def merge_sparse_features(
    a: rd.Dataset, b: rd.Dataset, offset: int | None = None
) -> rd.Dataset:
    """hstack semantics of mergeSparseFeatureFiles.py over long-form sparse
    feature tables: B's pattern ids shift by ``offset`` (the width of A's
    pattern space; defaults to ``max(a.pattern_id) + 1``) and the row sets
    union. Streaming: one small aggregate over A (only when ``offset`` is
    None), one zero-copy projection over B."""
    if offset is None:
        mx = a.max("pattern_id")  # None on an empty left side -> width 0
        offset = int(mx) + 1 if mx is not None else 0

    def shift(t: pa.Table, _off=int(offset)) -> pa.Table:
        return pa.table(
            {
                "graph_id": t["graph_id"].combine_chunks(),
                "pattern_id": pa.array(
                    t["pattern_id"].to_numpy() + _off, pa.int64()
                ),
                "pattern": t["pattern"].combine_chunks(),
            }
        )

    return a.select_columns(["graph_id", "pattern_id", "pattern"]).union(
        b.map_batches(shift, batch_format="pyarrow")
    )


def select_top_features(
    feats: rd.Dataset,
    labels: rd.Dataset,
    k: int = 20,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """chi2 top-k feature selection (selectTopFeatures.py semantics over
    binary presence features): for each pattern p with document frequency
    t_p over N labeled graphs, classes c with sizes n_c and per-class
    presence counts obs_{p,c},

        chi2(p) = sum_c (obs_{p,c} - e_{p,c})^2 / e_{p,c},
        e_{p,c} = (n_c * t_p) / N,

    summed over classes in SORTED class order (fixed float evaluation order
    so the DuckDB twin reproduces identical doubles), rounded half-away to
    6; top ``k`` by (chi2 DESC, pattern ASC) — a total order, so selection
    is deterministic.

    ``labels`` is the labeled graph universe (graph_id, cls) — ALL graphs
    of the DB, not just feature-bearing ones (N and n_c count the full
    universe, as chi2 over a feature matrix with all-zero rows would).
    Distribution: one bucketed exchange on graph_id co-locates each graph's
    label with its feature rows; per-bucket partials are
    (pattern_id, pattern, cls, cnt) plus per-class size partials — both
    pattern-space/class-scale, so the driver-side finish is small.
    """

    def tag_feats(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "graph_id": t["graph_id"].combine_chunks(),
                "pattern_id": t["pattern_id"].combine_chunks(),
                "pattern": t["pattern"].combine_chunks(),
                "cls": pa.array([""] * n, pa.string()),
                "side": pa.array(np.ones(n, np.int8)),
            }
        )

    def tag_labels(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "graph_id": t["graph_id"].combine_chunks(),
                "pattern_id": pa.array(np.full(n, -1, np.int64)),
                "pattern": pa.array([""] * n, pa.string()),
                "cls": t["cls"].combine_chunks(),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    tagged = feats.map_batches(tag_feats, batch_format="pyarrow").union(
        labels.map_batches(tag_labels, batch_format="pyarrow")
    )

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lab = df[df["side"] == 0][["graph_id", "cls"]]
        fe = df[df["side"] == 1][["graph_id", "pattern_id", "pattern"]]
        # per-class sizes over this bucket's graphs (labels partition by
        # graph_id, so each graph's label lives in exactly one bucket)
        ncls = lab.groupby("cls").size().reset_index(name="cnt")
        ncls.insert(0, "pattern", "")
        ncls.insert(0, "pattern_id", np.int64(-1))
        obs = (
            fe.merge(lab, on="graph_id")
            .groupby(["pattern_id", "pattern", "cls"])
            .size()
            .reset_index(name="cnt")
        )
        out = pd.concat([ncls, obs], ignore_index=True)
        return pa.Table.from_pandas(
            out.astype({"pattern_id": np.int64, "cnt": np.int64}),
            preserve_index=False,
        )

    parts = bucketed_group_combine(
        tagged, ["graph_id"], combine, num_buckets=num_buckets
    ).to_pandas()

    agg = (
        parts.groupby(["pattern_id", "pattern", "cls"])["cnt"]
        .sum()
        .reset_index()
    )
    sizes = agg[agg["pattern_id"] == -1].set_index("cls")["cnt"]
    classes = sorted(sizes.index)
    n_c = sizes.reindex(classes).to_numpy(np.int64)
    N = float(n_c.sum())
    obs = agg[agg["pattern_id"] >= 0]
    wide = (
        obs.pivot_table(
            index=["pattern_id", "pattern"], columns="cls", values="cnt",
            aggfunc="sum", fill_value=0,
        )
        .reindex(columns=classes, fill_value=0)
        .reset_index()
    )
    t_p = wide[classes].to_numpy(np.int64).sum(axis=1).astype(np.float64)
    chi2 = np.zeros(len(wide), np.float64)
    for j, c in enumerate(classes):  # fixed sorted-class accumulation order
        e = (float(n_c[j]) * t_p) / N
        d = wide[c].to_numpy(np.float64) - e
        chi2 = chi2 + (d * d) / e
    out = pd.DataFrame(
        {
            "pattern_id": wide["pattern_id"].to_numpy(np.int64),
            "pattern": wide["pattern"],
            "chi2": round_half_away(chi2, 6),
        }
    )
    out = out.sort_values(
        ["chi2", "pattern"], ascending=[False, True]
    ).head(k)
    return out.reset_index(drop=True)


def _cyclic_with_ids(sf_dir: str, offset: int) -> rd.Dataset:
    """Cyclic feature map as an id-assigned sparse table: pattern =
    'kind|feature', pattern_id = rank in the sorted distinct (kind, feature)
    space + ``offset``. The dictionary is pattern-space-scale (distinct
    features of a bounded pattern grammar), gathered once and broadcast —
    the algos.wl order-free-dictionary idiom."""
    import ray

    from .patterns import cyclic_pattern_features

    feats = cyclic_pattern_features(sf_dir).materialize()
    keys: set[tuple] = set()
    for b in feats.select_columns(["kind", "feature"]).iter_batches(
        batch_format="pyarrow"
    ):
        keys.update(
            zip(b["kind"].to_pylist(), b["feature"].to_pylist())
        )
    ids = {kf: i + offset for i, kf in enumerate(sorted(keys))}
    ids_ref = ray.put(ids)

    def assign(t: pa.Table) -> pa.Table:
        m = ray.get(ids_ref)
        kinds = t["kind"].to_pylist()
        fs = t["feature"].to_pylist()
        return pa.table(
            {
                "graph_id": t["graph_id"].combine_chunks(),
                "pattern_id": pa.array(
                    [m[(k, f)] for k, f in zip(kinds, fs)], pa.int64()
                ),
                "pattern": pa.array(
                    [f"{k}|{f}" for k, f in zip(kinds, fs)], pa.string()
                ),
            }
        )

    return feats.map_batches(assign, batch_format="pyarrow")


def _tree_feats_and_width(sf_dir: str):
    from .levelwise import levelwise_tree_mining
    from .mining import _n_graphs, order_graph_edges_full
    from .patterns import pattern_feature_table

    sup = max(3, (_n_graphs(sf_dir) + 5000) // 10000)
    frequent = levelwise_tree_mining(sf_dir, max_edges=2, min_support=sup)
    patterns = sorted(set(frequent["pattern"].tolist()))
    feats = pattern_feature_table(order_graph_edges_full(sf_dir), patterns)
    return feats, len(patterns)


def merge_sparse_features_query(sf_dir: str) -> rd.Dataset:
    """Driver-gate query: hstack the <=2-edge tree feature table (ids
    0..|P|-1) with the cyclic feature table (ids offset by |P|)."""
    tree_feats, width = _tree_feats_and_width(sf_dir)
    return merge_sparse_features(
        tree_feats, _cyclic_with_ids(sf_dir, width), offset=0
    )


def select_top_features_query(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Driver-gate query: chi2 top-k over the tree feature table; labels =
    o_orderpriority of each order-graph (the labeled universe = every
    distinct order in lineitem, matching the miner's transaction count)."""
    from ..sources.tables import read_table

    tree_feats, _ = _tree_feats_and_width(sf_dir)

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    )

    def tag_li(t: pa.Table) -> pa.Table:
        g = np.unique(t["l_orderkey"].to_numpy())
        return pa.table(
            {
                "graph_id": pa.array(g, pa.int64()),
                "cls": pa.array([""] * len(g), pa.string()),
                "side": pa.array(np.zeros(len(g), np.int8)),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "graph_id": t["o_orderkey"].combine_chunks(),
                "cls": t["o_orderpriority"].combine_chunks(),
                "side": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def semi(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        db = df[df["side"] == 0]["graph_id"].unique()
        lab = df[(df["side"] == 1) & df["graph_id"].isin(db)]
        lab = lab.drop_duplicates("graph_id")
        return pa.Table.from_pandas(
            lab[["graph_id", "cls"]], preserve_index=False
        )

    labels = bucketed_group_combine(both, ["graph_id"], semi)
    return select_top_features(tree_feats, labels, k=k)


def stratified_subset(
    labels: rd.Dataset, n: int, num_buckets: int = 32
) -> pd.DataFrame:
    """Stratified subset selection (the reference's
    ``/root/reference/python/subset.py`` method 0 — per-class proportional
    sampling for train/test splits), made DETERMINISTIC and SQL-twinnable:

    - per-class quota by the largest-remainder method over exact integer
      arithmetic: quota_c = floor(n * c_count / N) + 1 for the classes with
      the ``n - sum(floors)`` largest remainders ((n * c_count) mod N, ties
      broken by class name ascending);
    - within a class, the quota_c rows with the smallest
      md5_number_lower(graph_id) (ties by graph_id) are selected — a seeded
      uniform draw that DuckDB reproduces bit-exactly, where the reference
      uses ``random.randint``.

    Distributed shape: ONE pass over ``labels`` (graph_id, cls) emitting
    per-batch class-count partials AND per-class bottom-n candidate rows
    (a per-class bottom-n over any batch partition is a superset of the
    global bottom quota_c); the driver merges candidate rows bounded by
    classes x blocks x n. Returns (graph_id, cls) sorted by graph_id.
    """
    from ..stages.dedup_md5 import md5_u64

    n = int(n)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "graph_id": t["graph_id"].to_numpy(),
                "cls": t["cls"].to_pylist(),
            }
        )
        df["h"] = md5_u64(
            df["graph_id"].astype(np.int64).astype(str).to_numpy(object)
        ).astype(np.uint64)
        cand = (
            df.sort_values(["cls", "h", "graph_id"])
            .groupby("cls", sort=False)
            .head(n)
        )
        counts = df.groupby("cls").size().reset_index(name="cnt")
        counts["graph_id"] = np.int64(-1)
        counts["h"] = np.uint64(0)
        out = pd.concat(
            [counts[["graph_id", "cls", "h", "cnt"]],
             cand.assign(cnt=np.int64(-1))],
            ignore_index=True,
        )
        return pa.Table.from_pandas(
            out.astype({"graph_id": np.int64, "cnt": np.int64}),
            preserve_index=False,
        )

    parts = labels.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or "graph_id" not in parts.columns:
        return pd.DataFrame({"graph_id": pd.Series([], dtype=np.int64),
                             "cls": pd.Series([], dtype=object)})
    sizes = (
        parts[parts["graph_id"] == -1].groupby("cls")["cnt"].sum().sort_index()
    )
    N = int(sizes.sum())
    if N == 0 or n <= 0:
        return pd.DataFrame({"graph_id": pd.Series([], dtype=np.int64),
                             "cls": pd.Series([], dtype=object)})
    floors = (n * sizes) // N
    rems = (n * sizes) % N
    extra = n - int(floors.sum())
    # largest remainder, ties by class name ascending (sizes is name-sorted)
    order = sorted(sizes.index, key=lambda c: (-int(rems[c]), c))
    quota = {c: int(floors[c]) for c in sizes.index}
    for c in order[:extra]:
        quota[c] += 1
    cand = parts[parts["graph_id"] != -1]
    picked = []
    for c, g in cand.groupby("cls", sort=True):
        k = min(quota.get(c, 0), len(g))
        if k:
            picked.append(
                g.sort_values(["h", "graph_id"]).head(k)[["graph_id", "cls"]]
            )
    if not picked:
        return pd.DataFrame({"graph_id": pd.Series([], dtype=np.int64),
                             "cls": pd.Series([], dtype=object)})
    out = pd.concat(picked, ignore_index=True).sort_values("graph_id")
    return out.reset_index(drop=True).astype({"graph_id": np.int64})


def stratified_subset_query(sf_dir: str, n: int = 400) -> pd.DataFrame:
    """Driver-gate query: stratified n-row subset of the labeled order
    universe (graph_id = order, cls = o_orderpriority — the same labeled
    dataset select_top_features uses)."""
    from ..sources.tables import read_table

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    )

    def lab(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "graph_id": t["o_orderkey"].combine_chunks(),
                "cls": t["o_orderpriority"].combine_chunks(),
            }
        )

    return stratified_subset(
        orders.map_batches(lab, batch_format="pyarrow"), n=n
    )


def tci_mean(scores: rd.Dataset) -> pd.DataFrame:
    """tciMean score aggregation (reference ``python/tciMean.py:24-41``):
    per score file ("method") and sign class, the geometric mean of the
    scores plus the multiplicative geometric-SD band the reference plots —
    gsd = exp(sqrt(mean(ln(x/gm)^2))), band = [gm/sqrt(gsd), gm*sqrt(gsd)].
    Classes: 'pos' ('+'-labeled rows), 'neg' ('-'), 'all' (both), emitted
    only when non-empty (the reference crashes on an empty class).

    ``scores`` columns: (method string, label string in {'+','-'},
    score float64 > 0).

    Determinism contract (what makes the SQL twin hash-exact): per class
    the scores are sorted ascending and both fold sums (Σ ln x and
    Σ ln(x/gm)²) accumulate LEFT TO RIGHT over that order; ln/exp go
    through libm (DuckDB's ln/exp are libm — numpy's SIMD transcendentals
    differ by ulps, measured). The value-scale exchange is inherent: an
    order-sensitive fold cannot pre-combine, and score files are tiny by
    nature (one row per cross-validation run).

    Returns (method, cls, n, gmean, gsd, lo, hi) sorted."""
    import math

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for method, g in df.groupby("method", sort=True):
            pos = np.sort(g.loc[g["label"] == "+", "score"].to_numpy(np.float64))
            neg = np.sort(g.loc[g["label"] == "-", "score"].to_numpy(np.float64))
            for cls, vals in (
                ("pos", pos), ("neg", neg),
                ("all", np.sort(np.concatenate([pos, neg]))),
            ):
                n = len(vals)
                if n == 0:
                    continue
                lns = [math.log(v) for v in vals]
                s1 = lns[0]
                for x in lns[1:]:
                    s1 = s1 + x
                gm = math.exp(s1 / n)
                # u*u, not u**2: CPython's float ** goes through libm pow
                # and is not guaranteed bit-equal to the twin's ln(x)*ln(x)
                terms = [
                    u * u for u in (math.log(v / gm) for v in vals)
                ]
                s2 = terms[0]
                for x in terms[1:]:
                    s2 = s2 + x
                gsd = math.exp(math.sqrt(s2 / n))
                rows.append(
                    (method, cls, n, gm, gsd,
                     gm / math.sqrt(gsd), gm * math.sqrt(gsd))
                )
        if not rows:
            return pa.table(
                {"method": pa.array([], pa.string()),
                 "cls": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()),
                 "gmean": pa.array([], pa.float64()),
                 "gsd": pa.array([], pa.float64()),
                 "lo": pa.array([], pa.float64()),
                 "hi": pa.array([], pa.float64())}
            )
        m, c, n_, gm_, gsd_, lo_, hi_ = zip(*rows)
        return pa.table(
            {"method": pa.array(m, pa.string()),
             "cls": pa.array(c, pa.string()),
             "n": pa.array(n_, pa.int64()),
             "gmean": pa.array(gm_, pa.float64()),
             "gsd": pa.array(gsd_, pa.float64()),
             "lo": pa.array(lo_, pa.float64()),
             "hi": pa.array(hi_, pa.float64())}
        )

    out = bucketed_group_combine(scores, ["method"], combine).to_pandas()
    return out.sort_values(["method", "cls"]).reset_index(drop=True)


def tci_mean_query(sf_dir: str) -> pd.DataFrame:
    """Driver-gate query: tciMean over a score table derived from orders —
    method = o_orderpriority (the per-file axis), '+' = fulfilled orders
    (o_orderstatus = 'F'), score = o_totalprice (> 0 by construction)."""
    from ..sources.tables import read_table

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def to_scores(t: pa.Table) -> pa.Table:
        status = t["o_orderstatus"].to_pylist()
        return pa.table(
            {
                "method": t["o_orderpriority"].combine_chunks(),
                "label": pa.array(
                    ["+" if s == "F" else "-" for s in status], pa.string()
                ),
                "score": t["o_totalprice"].combine_chunks().cast(pa.float64()),
            }
        )

    return tci_mean(orders.map_batches(to_scores, batch_format="pyarrow"))
