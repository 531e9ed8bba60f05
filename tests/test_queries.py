"""Driver-conformance dress rehearsal: run every queries() entry at
sf0.001 and compare the SQL-oracled ones against DuckDB the way the driver
does (row count + sorted-column value equality, order-insensitive)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql())
ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_duckdb(con, name):
    ray_df = normalize(to_df(entrymod.queries()[name](SF)))
    sql_df = normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: cols {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED])
def test_rows_only_queries_run(name):
    df = to_df(entrymod.queries()[name](SF))
    assert len(df) >= 0 and len(df.columns) > 0


def test_entry_smoke():
    res = entrymod.entry()
    df = to_df(res)
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "text", "ts"} <= set(df.columns)
