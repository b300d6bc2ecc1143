"""Local mirror of the driver's correctness gate: every queries() entry vs
its oracle_sql() DuckDB result at sf0.001 (order-insensitive, exact after
the shared rounding contract)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def normalize(obj) -> pd.DataFrame:
    if isinstance(obj, rd.Dataset):
        obj = obj.to_pandas()
    elif not isinstance(obj, pd.DataFrame):
        obj = obj.to_pandas()  # pyarrow.Table
    df = obj.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(np.int64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif df[c].dtype == object and len(df) and isinstance(
            df[c].iloc[0], (list, np.ndarray)
        ):
            df[c] = df[c].map(lambda v: str(list(v)))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(SQL_CHECKED))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, con):
    got = normalize(entrymod.queries()[name](SF_DIR))
    want = normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    res = entrymod.queries()[name](SF_DIR)
    df = normalize(res)
    assert len(df) >= 0
    assert len(df.columns) >= 1


def test_entry_smoke():
    res = entrymod.entry()
    df = normalize(res)
    assert len(df) > 0
    assert {"rank", "vertex_id"} == set(df.columns)


def test_join_fallback_paths_identical(ray_session):
    """Size-thresholded join fallback: forcing the bucketed-exchange path
    (broadcast_limit=0) must reproduce the broadcast path bit-for-bit for
    both SF-scaling dimension joins (nation_revenue's customer lookup, q5's
    customer+supplier lookups)."""
    from graphminingtools_ray.pipelines.relational import (
        nation_revenue,
        q5_local_supplier_volume,
    )

    sf = "/root/testdata/sf0.001"
    assert nation_revenue(sf).equals(nation_revenue(sf, broadcast_limit=0))
    assert q5_local_supplier_volume(sf).equals(
        q5_local_supplier_volume(sf, broadcast_limit=0)
    )
