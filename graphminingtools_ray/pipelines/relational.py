"""Relational operator pipelines over the TPC-H-ish tables.

These exercise the engine's scan / filter / project / aggregate / join /
sort-limit / window surface — the Ray Data re-expression of the reference's
``gf`` filter executable (measure → predicate → projection,
``/root/reference/executables/filter.c:386-586``) and its trie-based
partial+final aggregation (``searchTree.c:372-456``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count

from ..functions.rounding import round_half_away
from ..sources.tables import read_table


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan → derived columns → grouped aggregate.
    Batch-local partials via vectorized arrow kernels; Sum/Count finalize."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def derive_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        # money columns are exact 2-decimal values: do EVERY aggregate in
        # scaled integers so sums are EXACT and independent of summation
        # order (float sums round-trip differently between engines), and
        # pre-aggregate per batch — the final combine is 6 rows × #batches,
        # so no shuffle operator is needed at all (partial+final pattern,
        # searchTree.c:372-456 shape)
        ep_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_pct = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        tax_pct = np.rint(t["l_tax"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        qty_c = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "sum_qty_c": qty_c,
                "sum_base_price_c": ep_c,
                "sum_disc_price_e4": ep_c * (100 - disc_pct),
                "sum_charge_e6": ep_c * (100 - disc_pct) * (100 + tax_pct),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty_c=("sum_qty_c", "sum"),
            sum_base_price_c=("sum_base_price_c", "sum"),
            sum_disc_price_e4=("sum_disc_price_e4", "sum"),
            sum_charge_e6=("sum_charge_e6", "sum"),
            count_order=("sum_qty_c", "size"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(derive_partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby(["l_returnflag", "l_linestatus"], sort=True)
        .sum()
        .reset_index()
    )
    out["sum_qty"] = round_half_away(out.pop("sum_qty_c") / 100.0, 2)
    out["sum_base_price"] = round_half_away(out.pop("sum_base_price_c") / 100.0, 2)
    out["sum_disc_price_e4"] = out["sum_disc_price_e4"].astype(np.int64)
    out["sum_charge_e6"] = out["sum_charge_e6"].astype(np.int64)
    out["count_order"] = out["count_order"].astype(np.int64)
    return out[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price_e4", "sum_charge_e6", "count_order"]
    ]


def filter_project_revenue(sf_dir: str):
    """Per-row map + predicate + projection (the ``gf`` scan shape)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def fn(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
            pc.greater(t["l_discount"], 0.05),
        )
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": round_half_away(rev.to_numpy(zero_copy_only=False), 2),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _guarded_lookup(keys_sorted: np.ndarray, vals: np.ndarray,
                    probe: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(matched mask, value per matched probe) — a searchsorted join that
    DROPS probes whose key is absent from the dimension side (inner-join
    semantics) instead of crashing past the array end or silently crediting
    a neighbor key. Shared by the broadcast AND bucketed plans so both
    behave identically on foreign-key-violating input."""
    if len(keys_sorted) == 0:
        return np.zeros(len(probe), bool), np.empty(0, vals.dtype)
    pos = np.searchsorted(keys_sorted, probe)
    pos_c = np.minimum(pos, len(keys_sorted) - 1)
    m = keys_sorted[pos_c] == probe
    return m, vals[pos_c[m]]


def _nation_partial(nk: np.ndarray, cents: np.ndarray) -> pa.Table:
    """(n_nationkey, revenue_c, n_orders) partial over already-attached
    nation keys — shared by the broadcast and bucketed nation_revenue
    plans so both produce bit-identical partials."""
    uk, inv = np.unique(nk, return_inverse=True)
    rev = np.zeros(len(uk), np.int64)
    np.add.at(rev, inv, cents)
    return pa.table(
        {
            "n_nationkey": uk.astype(np.int64),
            "revenue_c": rev,
            "n_orders": np.bincount(inv, minlength=len(uk)).astype(np.int64),
        }
    )


# Above this many rows a "dimension" side stops being broadcastable (TPC-H
# customer/supplier grow 150k/10k × SF: at SF 100+ the sorted key arrays are
# multi-GB) and keyed-exchange plans take over. Gate/bench scales stay on
# the broadcast path; the bucketed path is pinned equal by pytest.
BROADCAST_ROW_LIMIT = 2_000_000


def nation_revenue(sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT):
    """orders ⋈ customer ⋈ nation → per-nation revenue. nation is
    fixed-size → always broadcast. customer scales with SF: below
    ``broadcast_limit`` rows it broadcasts as a sorted key array via
    ``ray.put`` (binary-search lookup per batch, no shuffle); above, ONE
    bucketed exchange keyed on custkey co-locates each customer row with
    its orders (the q5 fact-fact pattern) — same partials bit-for-bit."""
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    cust_ds = read_table(sf_dir, "customer",
                         columns=["c_custkey", "c_nationkey"])
    orders_ds = read_table(sf_dir, "orders",
                           columns=["o_custkey", "o_totalprice"])

    def order_cents(t: pa.Table):
        # totalprice is an exact 2-decimal value → sum in integer cents
        return np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)

    if cust_ds.count() <= broadcast_limit:
        cust = cust_ds.to_pandas()
        order = np.argsort(cust["c_custkey"].to_numpy())
        ck_sorted = cust["c_custkey"].to_numpy()[order]
        nk_of_ck = cust["c_nationkey"].to_numpy()[order]
        ref = ray.put((ck_sorted, nk_of_ck))

        def attach_partial(t: pa.Table) -> pa.Table:
            # broadcast binary-search lookup (no per-row Python) + per-batch
            # partial aggregate keyed on the INT nationkey (25 groups — the
            # final combine is tiny, no shuffle operator needed)
            ck_s, nk_ = ray.get(ref)
            m, nk = _guarded_lookup(ck_s, nk_, t["o_custkey"].to_numpy())
            return _nation_partial(nk, order_cents(t)[m])

        parts = orders_ds.map_batches(
            attach_partial, batch_format="pyarrow"
        ).to_pandas()
    else:
        from ..functions.bucketing import bucketed_group_combine

        def cust_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "k": t["c_custkey"].combine_chunks(),
                    "nat": t["c_nationkey"].combine_chunks().cast(pa.int64()),
                    "cents": np.zeros(n, np.int64),
                    "side": np.zeros(n, np.int8),
                }
            )

        def order_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "k": t["o_custkey"].combine_chunks(),
                    "nat": np.full(n, -1, np.int64),
                    "cents": order_cents(t),
                    "side": np.ones(n, np.int8),
                }
            )

        def attach_bucket(t: pa.Table) -> pa.Table:
            k = t["k"].to_numpy()
            nat = t["nat"].to_numpy()
            cents = t["cents"].to_numpy()
            is_dim = t["side"].to_numpy() == 0
            dk, dn = k[is_dim], nat[is_dim]
            o = np.argsort(dk, kind="stable")
            dk, dn = dk[o], dn[o]
            fk, fc = k[~is_dim], cents[~is_dim]
            m, nk = _guarded_lookup(dk, dn, fk)
            return _nation_partial(nk, fc[m])

        both = cust_ds.map_batches(cust_rows, batch_format="pyarrow").union(
            orders_ds.map_batches(order_rows, batch_format="pyarrow")
        )
        parts = bucketed_group_combine(both, ["k"], attach_bucket).to_pandas()

    out = parts.groupby("n_nationkey", sort=True).sum().reset_index()
    out = out.merge(nat, on="n_nationkey", how="left")
    out["revenue"] = round_half_away(out.pop("revenue_c") / 100.0, 2)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out[["n_name", "revenue", "n_orders"]]


def topk_orders(sf_dir: str, k: int = 10):
    """sort desc + deterministic tiebreak + limit (SURVEY §2.6 top-k)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate: window = hour(ts) (streaming-shaped per
    SURVEY §2.9 — Ray Data has no watermarks; windows are keyed groupbys)."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def win_partial(t: pa.Table) -> pa.Table:
        # value is an exact 2-decimal quantity → aggregate in integer cents;
        # pre-aggregate per batch (hour×type groups are few) so the final
        # combine is tiny and no shuffle operator is needed
        df = pd.DataFrame(
            {
                "hour": pc.floor_temporal(t["ts"], unit="hour").to_pandas(),
                "event_type": t["event_type"].to_pandas(),
                "value_c": np.rint(
                    t["value"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        g = df.groupby(["hour", "event_type"], sort=False).agg(
            n_events=("value_c", "size"), sum_value_c=("value_c", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(win_partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["hour", "event_type"], sort=True).sum().reset_index()
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value_c"] = out["sum_value_c"].astype(np.int64)
    return out


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: a new session starts after a gap > 30 min.
    Ordering contract: (ts, event_id) within user (SURVEY §2.9).

    Hash-bucketed exchange keyed on user + ONE vectorized pass per bucket
    (lexsort → per-user segmented gap count) — replaces the per-key
    ``map_groups`` path, which is ~20x slower and unbounded on a hot user."""
    from ..functions.bucketing import bucketed_group_combine

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def combine(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        ts = t["ts"].to_numpy()  # datetime64
        order = np.lexsort((e, ts, u))
        u, ts = u[order], ts[order]
        same_user = u[1:] == u[:-1]
        new_session = same_user & ((ts[1:] - ts[:-1]) > gap)
        uk, inv = np.unique(u, return_inverse=True)
        n_events = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        extra = np.zeros(len(uk), dtype=np.int64)
        np.add.at(extra, inv[1:][new_session], 1)
        return pa.table(
            {
                "user_id": uk,
                "n_events": n_events,
                "n_sessions": 1 + extra,
            }
        )

    return bucketed_group_combine(ds, ["user_id"], combine)


def mktsegment_distinct(sf_dir: str):
    """distinct over one column (reference: trie distinct count,
    ``searchTree.c:475-490``)."""
    return (
        read_table(sf_dir, "customer", columns=["c_mktsegment"])
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_customers"))
    )


def q3_shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-15",
    k: int = 10,
):
    """TPC-H Q3 shape: customer(segment) ⋈ orders(date < cutoff) ⋈
    lineitem(shipdate > cutoff) → per-order revenue, top-k by
    (revenue desc, orderkey asc). Join plan for scale: the CUSTOMER side is
    dimension-scale and broadcast (sorted key array via ``ray.put``, binary
    search per batch); ORDERS and LINEITEM are both fact-scale, so they meet
    in ONE bucketed exchange keyed on orderkey (lineitem pre-aggregates
    revenue per orderkey inside each map task first). Top-k never sorts
    globally: each bucket emits its local top-k, the driver merges k×buckets
    rows. Revenue is EXACT int64 in 1e-4 currency units (extendedprice and
    discount are 2-decimal), so oracle agreement is integer equality."""
    from ..functions.bucketing import bucketed_group_combine

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    keys = np.sort(
        cust.loc[cust["c_mktsegment"] == segment, "c_custkey"]
        .to_numpy(np.int64)
    )
    ref = ray.put(keys)
    cut = np.datetime64(cutoff)

    def order_rows(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        ck = t["o_custkey"].to_numpy()
        od = t["o_orderdate"].to_numpy()
        pos = np.searchsorted(ks, ck)
        pos[pos >= len(ks)] = 0
        m = (ks[pos] == ck) & (od < cut) if len(ks) else np.zeros(len(ck), bool)
        return pa.table(
            {
                "k": t["o_orderkey"].to_numpy()[m],
                "revenue_e4": np.zeros(int(m.sum()), np.int64),
                "odate_ns": od[m].astype("datetime64[ns]").astype(np.int64),
                "prio": t["o_orderpriority"].filter(pa.array(m)),
                "is_order": np.ones(int(m.sum()), np.int8),
            }
        )

    def line_rows(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy()
        m = sd > cut
        ok = t["l_orderkey"].to_numpy()[m]
        e_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100
        ).astype(np.int64)
        d_c = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False)[m] * 100
        ).astype(np.int64)
        rev = e_c * (100 - d_c)
        # batch-local combiner: partial revenue sum per orderkey
        uk, inv = np.unique(ok, return_inverse=True)
        acc = np.zeros(len(uk), np.int64)
        np.add.at(acc, inv, rev)
        return pa.table(
            {
                "k": uk,
                "revenue_e4": acc,
                "odate_ns": np.zeros(len(uk), np.int64),
                "prio": pa.array([""] * len(uk), pa.string()),
                "is_order": np.zeros(len(uk), np.int8),
            }
        )

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_rows, batch_format="pyarrow")
    lines = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(line_rows, batch_format="pyarrow")

    def join_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_o = df["is_order"] == 1
        o = df[is_o]
        rev = (
            df[~is_o].groupby("k", sort=False)["revenue_e4"].sum()
        )
        j = o[o["k"].isin(rev.index)].copy()
        if len(j) == 0:
            return pa.table(
                {"l_orderkey": np.empty(0, np.int64),
                 "revenue_e4": np.empty(0, np.int64),
                 "odate_ns": np.empty(0, np.int64),
                 "o_orderpriority": pa.array([], pa.string())}
            )
        j["revenue_e4"] = rev[j["k"]].to_numpy()
        j = j.sort_values(["revenue_e4", "k"], ascending=[False, True]).head(k)
        return pa.table(
            {
                "l_orderkey": j["k"].to_numpy(np.int64),
                "revenue_e4": j["revenue_e4"].to_numpy(np.int64),
                "odate_ns": j["odate_ns"].to_numpy(np.int64),
                "o_orderpriority": pa.array(j["prio"].tolist(), pa.string()),
            }
        )

    part = bucketed_group_combine(orders.union(lines), ["k"], join_topk)
    out = part.to_pandas()
    out = out.sort_values(
        ["revenue_e4", "l_orderkey"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    return pd.DataFrame(
        {
            "l_orderkey": out["l_orderkey"].to_numpy(np.int64),
            "revenue_e4": out["revenue_e4"].to_numpy(np.int64),
            "o_orderdate": pd.to_datetime(out["odate_ns"].to_numpy()),
            "o_orderpriority": out["o_orderpriority"],
        }
    )


def click_view_asof(sf_dir: str):
    """Keyed AS-OF JOIN — one of the custom-operator family (as-of / range /
    window) the Dataset API lacks, expressed as a composition per the
    engine's standard recipe: for every 'click' event, the LATEST 'view'
    event of the same user at-or-before the click's timestamp (−1 when
    none; ties view.ts == click.ts match, like SQL ASOF's v.ts <= c.ts).
    ONE bucketed exchange keyed on user_id; inside a bucket the classic
    vectorized as-of merge: lexsort (user, ts, views-before-clicks), running
    maximum over view row indices, same-user validity check — no per-row
    loop, no global sort. Equal-timestamp DUPLICATE views of one user are
    tie-broken arbitrarily (sub-microsecond event data makes this
    unobservable; documented for parity audits)."""
    import pyarrow.compute as pc2

    from ..functions.bucketing import bucketed_group_combine

    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def tag(t: pa.Table) -> pa.Table:
        is_click = pc2.equal(t["event_type"], "click")
        is_view = pc2.equal(t["event_type"], "view")
        m = pc2.or_(is_click, is_view)
        t2 = t.filter(m)
        return pa.table(
            {
                "user_id": t2["user_id"],
                "ts_ns": t2["ts"].cast(pa.int64()),
                "event_id": t2["event_id"],
                "is_view": pc2.equal(t2["event_type"], "view").cast(pa.int8()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def asof_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        ts = t["ts_ns"].to_numpy()
        eid = t["event_id"].to_numpy()
        isv = t["is_view"].to_numpy()
        order = np.lexsort((1 - isv, ts, u))  # views first at equal (u, ts)
        u, ts, eid, isv = u[order], ts[order], eid[order], isv[order]
        n = len(u)
        idx = np.where(isv == 1, np.arange(n), -1)
        last = np.maximum.accumulate(idx) if n else idx
        is_click = isv == 0
        li = last[is_click]
        ok = li >= 0
        ok[ok] &= u[li[ok]] == u[np.flatnonzero(is_click)[ok]]
        view_eid = np.where(ok, eid[np.maximum(li, 0)], -1)
        return pa.table(
            {
                "event_id": eid[is_click],
                "user_id": u[is_click],
                "view_event_id": view_eid.astype(np.int64),
            }
        )

    out = bucketed_group_combine(tagged, ["user_id"], asof_bucket).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def events_sliding(sf_dir: str, window_min: int = 60, hop_min: int = 15):
    """Sliding (hopping) window aggregate — window 60 min, hop 15 min: every
    event lands in window/hop = 4 windows; per (window_start, event_type)
    emit event count and exact integer-cents value sum. Window starts are
    epoch-aligned hop multiples (engine: ts_ns // hop_ns; oracle:
    floor(epoch/900)*900 — identical alignment). Per-batch combiner (each
    batch pre-aggregates its 4× expanded rows) → one bucketed exchange keyed
    (window, type)."""
    from ..functions.bucketing import bucketed_group_combine

    n_sub = window_min // hop_min
    hop_ns = hop_min * 60 * 10**9
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.timestamp("ns")).cast(pa.int64()).to_numpy()
        cents = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        k = ts // hop_ns
        widx = (np.repeat(k, n_sub)
                - np.tile(np.arange(n_sub, dtype=np.int64), len(k)))
        et_codes, et_dict = pd.factorize(
            t["event_type"].to_pandas(), sort=True
        )
        df = pd.DataFrame(
            {
                "w": widx,
                "e": np.repeat(et_codes, n_sub),
                "c": np.repeat(cents, n_sub),
            }
        )
        g = df.groupby(["w", "e"], sort=False).agg(
            n_events=("c", "size"), sum_value_c=("c", "sum")
        ).reset_index()
        return pa.table(
            {
                "window_ns": (g["w"] * hop_ns).to_numpy(np.int64),
                "event_type": pa.array(
                    et_dict[g["e"].to_numpy()], pa.string()
                ),
                "n_events": g["n_events"].to_numpy(np.int64),
                "sum_value_c": g["sum_value_c"].to_numpy(np.int64),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def combine(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return (
            df.groupby(["window_ns", "event_type"], sort=True)
            .agg(n_events=("n_events", "sum"), sum_value_c=("sum_value_c", "sum"))
            .reset_index()
        )

    out = bucketed_group_combine(
        parts, ["window_ns", "event_type"], combine
    ).to_pandas()
    out["window_start"] = pd.to_datetime(out.pop("window_ns"))
    out = out[["window_start", "event_type", "n_events", "sum_value_c"]]
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def click_view_range(sf_dir: str, window_min: int = 30):
    """Keyed RANGE JOIN (band join) — completes the as-of/range/window
    custom-operator family: for every 'click', the COUNT of same-user
    'view' events in the half-open window (click.ts − 30 min, click.ts].
    ONE bucketed exchange keyed on user_id; inside a bucket the counts come
    from the merge-tag trick, fully vectorized: views and two probe rows per
    click (left/right window bounds) are lexsorted by (user, ts,
    views-before-probes), a running view counter is read at both probe
    positions, and the difference is the in-window count (cross-user
    prefix contamination cancels in the difference because both probes sit
    inside the same user's sort span)."""
    import pyarrow.compute as pc2

    from ..functions.bucketing import bucketed_group_combine

    win_ns = window_min * 60 * 10**9
    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def tag(t: pa.Table) -> pa.Table:
        is_click = pc2.equal(t["event_type"], "click")
        is_view = pc2.equal(t["event_type"], "view")
        t2 = t.filter(pc2.or_(is_click, is_view))
        return pa.table(
            {
                "user_id": t2["user_id"],
                "ts_ns": t2["ts"].cast(pa.timestamp("ns")).cast(pa.int64()),
                "event_id": t2["event_id"],
                "is_view": pc2.equal(t2["event_type"], "view").cast(pa.int8()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def range_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        ts = t["ts_ns"].to_numpy()
        eid = t["event_id"].to_numpy()
        isv = t["is_view"].to_numpy() == 1
        cu, cts, ceid = u[~isv], ts[~isv], eid[~isv]
        vu, vts = u[isv], ts[isv]
        nc, nv = len(cu), len(vu)
        # merged rows: views (tag 0) then right probes (tag 1) then left
        # probes (tag 1) at equal (user, ts) — both bounds count views <= ts
        mu = np.concatenate([vu, cu, cu])
        mts = np.concatenate([vts, cts, cts - win_ns])
        mtag = np.concatenate(
            [np.zeros(nv, np.int8), np.ones(2 * nc, np.int8)]
        )
        order = np.lexsort((mtag, mts, mu))
        cum = np.cumsum(mtag[order] == 0)
        pos = np.empty(len(order), np.int64)
        pos[order] = np.arange(len(order))
        right = cum[pos[nv : nv + nc]]
        left = cum[pos[nv + nc :]]
        return pa.table(
            {
                "event_id": ceid,
                "user_id": cu,
                "n_views": (right - left).astype(np.int64),
            }
        )

    out = bucketed_group_combine(tagged, ["user_id"], range_bucket).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _q5_line_partial(ok: np.ndarray, s_nat: np.ndarray,
                     rev: np.ndarray) -> pa.Table:
    """Batch-local combiner keyed (orderkey, supplier nation) — shared by
    the broadcast and bucketed q5 plans (bit-identical partials)."""
    from ..functions.bucketing import group_boundaries

    sc, starts, order = group_boundaries([ok, s_nat.astype(np.int64)])
    acc = (
        np.add.reduceat(rev[order], starts) if len(starts)
        else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "k": sc[0][starts] if len(starts) else np.empty(0, np.int64),
            "nat": sc[1][starts] if len(starts) else np.empty(0, np.int64),
            "rev_e4": acc,
            "is_order": np.zeros(len(starts), np.int8),
        }
    )


def _q5_line_rev(t: pa.Table) -> np.ndarray:
    """Exact int64 1e-4-unit revenue extendedprice*(1-discount) per row."""
    e_c = np.rint(
        t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    d_c = np.rint(
        t["l_discount"].to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    return e_c * (100 - d_c)


def q5_local_supplier_volume(sf_dir: str,
                             broadcast_limit: int = BROADCAST_ROW_LIMIT):
    """TPC-H Q5 shape (local supplier volume): revenue from lineitems whose
    SUPPLIER and ordering CUSTOMER sit in the same nation, per (region,
    nation). Join plan: nation/region are fixed-size → always broadcast;
    customer/supplier broadcast as sorted key arrays (binary search per
    batch) only while under ``broadcast_limit`` rows — they grow with SF,
    so above the limit each lookup becomes its own bucketed exchange
    (orders⋈customer on custkey, lineitem⋈supplier on suppkey) feeding the
    same fact-fact exchange. Lineitem rows pre-aggregate (orderkey,
    supplier-nation) partials inside each map/bucket task; the orderkey
    bucket combine attaches the order's customer nation, keeps equal-nation
    rows, and emits nation-keyed partials — the driver final is
    nation-cardinality-scale. Revenue is exact int64 1e-4 units."""
    from ..functions.bucketing import bucketed_group_combine

    nat = read_table(sf_dir, "nation").to_pandas()
    reg = read_table(sf_dir, "region").to_pandas()
    cust_ds = read_table(sf_dir, "customer",
                         columns=["c_custkey", "c_nationkey"])
    supp_ds = read_table(sf_dir, "supplier",
                         columns=["s_suppkey", "s_nationkey"])
    orders_src = read_table(sf_dir, "orders",
                            columns=["o_orderkey", "o_custkey"])
    lines_src = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey",
                                     "l_extendedprice", "l_discount"]
    )

    if cust_ds.count() + supp_ds.count() <= broadcast_limit:
        cust = cust_ds.to_pandas()
        supp = supp_ds.to_pandas()

        def sorted_map(df, k, v):
            o = np.argsort(df[k].to_numpy())
            return df[k].to_numpy()[o], df[v].to_numpy()[o]

        ck, cn = sorted_map(cust, "c_custkey", "c_nationkey")
        sk, sn = sorted_map(supp, "s_suppkey", "s_nationkey")
        ref = ray.put((ck, cn, sk, sn))

        def order_rows(t: pa.Table) -> pa.Table:
            ck_, cn_, _, _ = ray.get(ref)
            m, c_nat = _guarded_lookup(ck_, cn_, t["o_custkey"].to_numpy())
            n = int(m.sum())
            return pa.table(
                {
                    "k": t["o_orderkey"].to_numpy()[m],
                    "nat": c_nat.astype(np.int64),
                    "rev_e4": np.zeros(n, np.int64),
                    "is_order": np.ones(n, np.int8),
                }
            )

        def line_rows(t: pa.Table) -> pa.Table:
            _, _, sk_, sn_ = ray.get(ref)
            m, s_nat = _guarded_lookup(sk_, sn_, t["l_suppkey"].to_numpy())
            return _q5_line_partial(
                t["l_orderkey"].to_numpy()[m], s_nat, _q5_line_rev(t)[m]
            )

        orders = orders_src.map_batches(order_rows, batch_format="pyarrow")
        lines = lines_src.map_batches(line_rows, batch_format="pyarrow")
    else:
        # dimension sides too big to ship to every task: one keyed
        # exchange per lookup (dim rows side=0, fact rows side=1; the
        # bucket's searchsorted is the same lookup the broadcast path runs)
        def dim_rows(key_col, val_col):
            def fn(t: pa.Table) -> pa.Table:
                n = t.num_rows
                return pa.table(
                    {
                        "k": t[key_col].combine_chunks(),
                        "a": t[val_col].combine_chunks().cast(pa.int64()),
                        "b": np.zeros(n, np.int64),
                        "side": np.zeros(n, np.int8),
                    }
                )
            return fn

        def fact_rows(key_col, a_col, rev_fn=None):
            def fn(t: pa.Table) -> pa.Table:
                n = t.num_rows
                return pa.table(
                    {
                        "k": t[key_col].combine_chunks(),
                        "a": t[a_col].combine_chunks().cast(pa.int64()),
                        "b": (rev_fn(t) if rev_fn
                              else np.zeros(n, np.int64)),
                        "side": np.ones(n, np.int8),
                    }
                )
            return fn

        def attach(t: pa.Table):
            k = t["k"].to_numpy()
            a = t["a"].to_numpy()
            b = t["b"].to_numpy()
            is_dim = t["side"].to_numpy() == 0
            dk, dv = k[is_dim], a[is_dim]
            o = np.argsort(dk, kind="stable")
            dk, dv = dk[o], dv[o]
            m = ~is_dim
            hit, vals = _guarded_lookup(dk, dv, k[m])
            keep = np.flatnonzero(m)[hit]
            return k[keep], a[keep], b[keep], vals

        def order_bucket(t: pa.Table) -> pa.Table:
            _, okeys, _, c_nat = attach(t)
            return pa.table(
                {
                    "k": okeys,  # o_orderkey rode in the 'a' slot
                    "nat": c_nat,
                    "rev_e4": np.zeros(len(okeys), np.int64),
                    "is_order": np.ones(len(okeys), np.int8),
                }
            )

        def line_bucket(t: pa.Table) -> pa.Table:
            _, okeys, rev, s_nat = attach(t)
            return _q5_line_partial(okeys, s_nat, rev)

        orders = bucketed_group_combine(
            cust_ds.map_batches(dim_rows("c_custkey", "c_nationkey"),
                                batch_format="pyarrow").union(
                orders_src.map_batches(
                    fact_rows("o_custkey", "o_orderkey"),
                    batch_format="pyarrow")),
            ["k"], order_bucket,
        )
        lines = bucketed_group_combine(
            supp_ds.map_batches(dim_rows("s_suppkey", "s_nationkey"),
                                batch_format="pyarrow").union(
                lines_src.map_batches(
                    fact_rows("l_suppkey", "l_orderkey",
                              rev_fn=_q5_line_rev),
                    batch_format="pyarrow")),
            ["k"], line_bucket,
        )

    def join_bucket(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        nat = t["nat"].to_numpy()
        rev = t["rev_e4"].to_numpy()
        iso = t["is_order"].to_numpy() == 1
        o_k, o_nat = k[iso], nat[iso]
        order = np.argsort(o_k, kind="stable")
        o_k, o_nat = o_k[order], o_nat[order]
        lk, lnat, lrev = k[~iso], nat[~iso], rev[~iso]
        pos = np.searchsorted(o_k, lk)
        pos_c = np.minimum(pos, max(len(o_k) - 1, 0))
        m = (len(o_k) > 0) & (o_k[pos_c] == lk) & (o_nat[pos_c] == lnat)
        un, inv = np.unique(lnat[m], return_inverse=True)
        acc = np.zeros(len(un), np.int64)
        np.add.at(acc, inv, lrev[m])
        return pa.table({"n_nationkey": un, "revenue_e4": acc})

    parts = bucketed_group_combine(
        orders.union(lines), ["k"], join_bucket
    ).to_pandas()
    out = parts.groupby("n_nationkey", sort=True).sum().reset_index()
    out = out.merge(nat, on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    )
    out = out[["r_name", "n_name", "revenue_e4"]]
    out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def topk_orders_per_group(sf_dir: str, k: int = 3):
    """Grouped top-k (SURVEY §2.6 widened): the k highest-value orders per
    o_orderpriority, tiebreak o_orderkey asc. Per-batch partial top-k per
    group (the combiner — only group_count × k rows leave each batch), tiny
    final merge; no global sort barrier."""
    ds = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def batch_topk_grouped(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            ["o_orderpriority", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        return pa.Table.from_pandas(
            df.groupby("o_orderpriority", sort=False).head(k),
            preserve_index=False,
        )

    parts = ds.map_batches(batch_topk_grouped,
                           batch_format="pyarrow").to_pandas()
    out = parts.sort_values(
        ["o_orderpriority", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True],
    ).groupby("o_orderpriority", sort=True).head(k)
    return out.reset_index(drop=True)


def price_percentiles(sf_dir: str):
    """EXACT distributed order statistics (p50/p90/p99, lower-interpolation
    rank floor(q·(n−1))) of l_extendedprice in integer cents. Per-batch
    value-histogram partials → value-keyed exchange sum → cumulative rank
    walk over the sorted distinct values (distinct-value-scale final,
    bounded by the price domain — the classic exact-quantile shape; at an
    unbounded domain swap in a sketch). All-integer, hash-exact vs SQL."""
    from ..functions.bucketing import bucketed_group_combine

    li = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partials(t: pa.Table) -> pa.Table:
        c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uv, cnt = np.unique(c, return_counts=True)
        return pa.table({"v": uv, "cnt": cnt.astype(np.int64)})

    def sum_bucket(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy()
        uv, inv = np.unique(v, return_inverse=True)
        cnt = np.bincount(inv, weights=t["cnt"].to_numpy(),
                          minlength=len(uv)).astype(np.int64)
        return pa.table({"v": uv, "cnt": cnt})

    hist = bucketed_group_combine(
        li.map_batches(partials, batch_format="pyarrow"), ["v"], sum_bucket
    ).to_pandas().sort_values("v").reset_index(drop=True)
    v = hist["v"].to_numpy()
    cnt = hist["cnt"].to_numpy()
    n = int(cnt.sum())
    cum = np.cumsum(cnt)

    def at_rank(q: float) -> int:
        kq = int(np.floor(q * (n - 1)))  # 0-indexed lower interpolation
        return int(v[np.searchsorted(cum, kq + 1)])

    return pd.DataFrame({
        "n": [np.int64(n)],
        "p50_c": [np.int64(at_rank(0.50))],
        "p90_c": [np.int64(at_rank(0.90))],
        "p99_c": [np.int64(at_rank(0.99))],
    })
