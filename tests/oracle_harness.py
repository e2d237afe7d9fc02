"""Local stand-in for the driver's DuckDB correctness gate.

Runs a declared query through Spark AND its oracle SQL through DuckDB over the
same parquet tables, then compares row count, column names, and values after
sorting columns by name and rows canonically — the strictest interpretation of
the driver's order-insensitive value-hash, so anything that passes here should
pass the real gate.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from bigdatafraude_ml_graphx_spark.catalog import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical cell text: stable formatting for floats / timestamps / None
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query"):
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} != oracle {len(expected)}"
    )
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: columns {sorted(actual.columns)} != oracle {sorted(expected.columns)}"
    )
    a, e = _canon(actual), _canon(expected)
    if not a.equals(e):
        diff_mask = (a != e).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(5).assign(_side="spark"),
             e[diff_mask].head(5).assign(_side="oracle")]
        )
        raise AssertionError(f"{name}: value mismatch\n{sample.to_string()}")
