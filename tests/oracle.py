"""Local re-implementation of the driver's DuckDB oracle comparison:
row count + schema-compatible columns + order-insensitive value hash.

Used by tests to catch Spark/DuckDB divergence before the driver does.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from starknet_indexer_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.execute(sql).df())
    if len(got) != len(want):
        return False, f"row count: spark={len(got)} duckdb={len(want)}"
    if list(got.columns) != list(want.columns):
        return False, f"columns: spark={list(got.columns)} duckdb={list(want.columns)}"
    try:
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
        )
    except AssertionError as e:
        return False, str(e)[:2000]
    return True, "ok"
