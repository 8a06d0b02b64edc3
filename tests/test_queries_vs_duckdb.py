"""Driver-gate rehearsal: run every queries() entry at sf0.001 and compare
row count + column names + order-insensitive values against oracle_sql()
via DuckDB (the same shape of check the driver performs at sf0.01)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con.sql(sql).df()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


SQL_QUERIES = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name):
    ray_df = to_pandas(entrymod.queries()[name](SF_SMOKE))
    duck_df = duck_run(entrymod.oracle_sql()[name])
    assert sorted(ray_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} vs {sorted(duck_df.columns)}")
    assert len(ray_df) == len(duck_df), (
        f"{name}: rows {len(ray_df)} vs {len(duck_df)}")
    # Dtype-strict: the driver's hash-level check is schema-sensitive, so
    # any numeric-dtype drift (e.g. int32 column widened to int64) must
    # fail HERE, not at judging time. No coercion of either side.
    a, b = canonical(ray_df), canonical(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=False,
                                  rtol=0, atol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    ray_df = to_pandas(entrymod.queries()[name](SF_SMOKE))
    assert ray_df is not None
    assert len(ray_df.columns) > 0


def test_entry_smoke():
    res = to_pandas(entrymod.entry())
    assert len(res) >= 0 and len(res.columns) > 0
