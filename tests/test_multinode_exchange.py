"""Multi-node plan selection for the raw keyed exchange.

The engine's workhorse shuffle (functions.bucketing._raw_exchange) must not
over-fetch on a real cluster: past one node, splits pack one object per
reducer-node bucket range and reducers are affinity-pinned to their range's
owner, so exchange bytes cross the NIC at most once. The sandbox has no real
cluster — these tests (a) exercise the range-packing split/reduce kernels
directly, and (b) run the full exchange on a simulated 2-node
``ray.cluster_utils.Cluster`` in a SUBPROCESS (the pytest session owns the
single-node Ray; a Cluster needs its own GCS) and compare against a local
pandas groupby oracle.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import numpy as np
import pyarrow as pa

from graphminingtools_ray.functions.bucketing import (
    _reduce_bucket_task,
    _split_by_bucket_task,
    bucket_values,
)


def _ident(t: pa.Table) -> pa.Table:
    return t


def test_range_packed_split_covers_all_rows_once():
    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "k": rng.integers(0, 1000, 5000).astype(np.int64),
            "v": rng.integers(0, 100, 5000).astype(np.int64),
        }
    )
    P = 32
    range_starts = [0, 11, 32]  # two uneven node ranges
    parts = _split_by_bucket_task(t, ["k"], P, False, range_starts)
    assert isinstance(parts, tuple) and len(parts) == 2
    total = 0
    b_all = bucket_values(t, ["k"], P)
    for j, part in enumerate(parts):
        if part is None:
            continue
        tbl, off = part
        total += tbl.num_rows
        lo_b, hi_b = range_starts[j], range_starts[j + 1]
        # every row's bucket lies in this range, offsets delimit each bucket
        b = bucket_values(tbl, ["k"], P)
        assert b.min() >= lo_b and b.max() < hi_b
        assert off[0] == 0 and off[-1] == tbl.num_rows
        for p_local in range(hi_b - lo_b):
            seg = b[off[p_local]:off[p_local + 1]]
            assert (seg == lo_b + p_local).all()
    assert total == t.num_rows
    # reducing every (range, local bucket) with identity reproduces the rows
    got = []
    for j, part in enumerate(parts):
        for p_local in range(range_starts[j + 1] - range_starts[j]):
            out, had = _reduce_bucket_task(_ident, p_local, part)
            if had:
                got.append(out)
    merged = pa.concat_tables(got)
    assert merged.num_rows == t.num_rows
    assert (
        np.sort(merged["v"].to_numpy()) == np.sort(t["v"].to_numpy())
    ).all()
    # single-range call stays the legacy single packed layout
    single = _split_by_bucket_task(t, ["k"], P, False, None)
    assert isinstance(single, tuple) and isinstance(single[0], pa.Table)
    assert single[0].num_rows == t.num_rows


_CLUSTER_SCRIPT = textwrap.dedent(
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": 2, "object_store_memory": 200 * 1024 * 1024},
    )
    cluster.add_node(num_cpus=2, object_store_memory=200 * 1024 * 1024)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    assert sum(n["Alive"] for n in ray.nodes()) == 2

    import ray.data as rd
    from graphminingtools_ray.functions.bucketing import (
        _alive_node_ids, bucketed_group_combine, sum_by_int_key,
    )

    assert len(_alive_node_ids()) == 2  # multi-node plan will be selected

    rng = np.random.default_rng(3)
    k = rng.integers(0, 500, 20000).astype(np.int64)
    v = rng.integers(0, 1000, 20000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(8)
    out = bucketed_group_combine(
        ds, ["k"], sum_by_int_key("k", "v"), num_buckets=16
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = (
        pd.DataFrame({"k": k, "v": v}).groupby("k", as_index=False)["v"].sum()
        .sort_values("k").reset_index(drop=True)
    )
    assert out.equals(want), (out.head(), want.head())
    print("MULTINODE_EXCHANGE_OK", len(out))

    # superstep substrate: node-ranged build shuffle + pagerank on 2 nodes
    # must match the local numpy power iteration
    from graphminingtools_ray.algos.pagerank import pagerank

    e_src = rng.integers(0, 300, 4000).astype(np.int64)
    e_dst = rng.integers(0, 300, 4000).astype(np.int64)
    m2 = e_src != e_dst
    e_src, e_dst = e_src[m2], e_dst[m2]
    edges = rd.from_arrow(
        pa.table({"src": e_src, "dst": e_dst})
    ).repartition(6)
    ids, ranks, info = pagerank(edges, tol=0.0, max_iter=8)
    vids = np.unique(np.concatenate([e_src, e_dst]))
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    outdeg = np.zeros(n)
    for s in e_src:
        outdeg[idx[int(s)]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(8):
        dm = r[outdeg == 0].sum()
        inc = np.zeros(n)
        contrib = r / np.where(outdeg == 0, 1.0, outdeg)
        for s, t in zip(e_src, e_dst):
            inc[idx[int(t)]] += contrib[idx[int(s)]]
        r = 0.15 / n + 0.85 * (inc + dm / n)
    got = np.empty(n)
    for v, rank in zip(ids, ranks):
        got[idx[int(v)]] = rank
    assert np.allclose(got, r, atol=1e-9), np.abs(got - r).max()
    print("MULTINODE_PAGERANK_OK", n)
    ray.shutdown()
    cluster.shutdown()
    """
)


def test_exchange_on_simulated_two_node_cluster():
    proc = subprocess.run(
        [sys.executable, "-c", _CLUSTER_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "MULTINODE_EXCHANGE_OK" in proc.stdout
    assert "MULTINODE_PAGERANK_OK" in proc.stdout
