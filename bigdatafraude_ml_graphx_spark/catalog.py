"""Table catalog over the driver-generated parquet testdata.

Mirrors the reference's dual surface (SURVEY.md §3.1/§3.2): every table is
reachable both as a DataFrame and as a SQL temp view
(``createOrReplaceTempView``, reference
``notebooks/2_sql_analysis.ipynb:81-82``). Parquet scans carry their schema
(self-describing mode, ``notebooks/1_data_cleaning.ipynb:351-355``), so no
redundant declared schema is forced on read — Catalyst still gets full column
pruning / predicate pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan of one testdata table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS). Depending on the
    Spark version the scan yields either

    * raw nanos as BIGINT (older Sparks honoring
      ``spark.sql.legacy.parquet.nanosAsLong``) — rebuilt into TIMESTAMP_NTZ
      via exact interval arithmetic (NOT ``timestamp_micros``, which yields
      TIMESTAMP_LTZ and shifts wall-clock values under a non-UTC session;
      the decimal division truncates to micros exactly as DuckDB does), or
    * a native TIMESTAMP_NTZ already truncated to micros (Spark ≥ 4.1 reads
      nanos natively and ignores the legacy conf) — passed through as-is.

    Branching on the SCANNED dtype (not the Spark version string) keeps the
    same code correct on both behaviors.
    """
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf removed in newer Sparks; native read handles nanos
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") not in ("bigint", "long"):
            return df
        ntz = (
            "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
            "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
        )
        return df.withColumn("ts", F.expr(ntz))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` works over them."""
    frames = load_tables(spark, sf_dir)
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
    return frames
