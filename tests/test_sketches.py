"""HLL distinct sketch: exact-kernel and accuracy properties.

The value-exactness vs DuckDB is covered by the oracle mirror suite
(test_queries_oracle); here we pin the integer bit-length kernel against
Python's and the estimator's accuracy bound on the real table.
"""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_bit_length_u64_matches_python():
    from graphminingtools_ray.pipelines.sketches import bit_length_u64

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 56, 2000, dtype=np.uint64)
    # adversarial: powers of two and neighbors (float log2 would misplace)
    edges = []
    for k in range(0, 57):
        edges += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    vals = np.concatenate([vals, np.array(edges, np.uint64), [np.uint64(0)]])
    got = bit_length_u64(vals)
    want = np.array([int(v).bit_length() for v in vals], np.int64)
    assert np.array_equal(got, want)


def test_hll_estimate_within_bound(ray_session):
    """HLL error is ~1.04/sqrt(m) = 6.5% at m=256; assert a generous
    4-sigma bound vs the exact distinct count, applying the standard
    linear-counting small-range correction (the oracled query ships the
    raw estimate + zero-register count so clients can do exactly this)."""
    sf_dir = SF_DIR
    import duckdb

    from graphminingtools_ray.pipelines.sketches import hll_estimate

    row = hll_estimate(sf_dir).iloc[0]
    est, m, v = float(row["estimate"]), int(row["m"]), int(
        row["n_zero_registers"])
    if est <= 2.5 * m and v > 0:
        est = m * np.log(m / v)  # Flajolet et al. 2007 small-range regime
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_partkey) FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 4 * 1.04 / np.sqrt(256)


def test_hll_registers_merge_is_max(ray_session):
    sf_dir = SF_DIR
    """Mergeability: the sketch of the whole equals the elementwise max of
    per-shard sketches (build the shards by splitting the value domain)."""
    import duckdb

    from graphminingtools_ray.pipelines.sketches import (
        _register_partials,
        hll_registers,
    )

    vals = duckdb.sql(
        f"SELECT l_partkey FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchnumpy()["l_partkey"].astype(np.int64)
    strs = vals.astype("U").astype(object)
    half = len(strs) // 2
    merged = np.maximum(_register_partials(strs[:half]),
                        _register_partials(strs[half:]))
    whole = hll_registers(sf_dir)["max_rank"].to_numpy()
    assert np.array_equal(merged, whole)
