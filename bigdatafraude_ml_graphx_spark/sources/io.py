"""Batch sources and sinks (SURVEY §2.1 S1-S4, S6, S9).

Reference sites: CSV scan with header+inferSchema
(``/root/reference/notebooks/1_data_cleaning.ipynb:40-43``), parquet scan
(``notebooks/2_sql_analysis.ipynb:75-78``), parquet sink with coalesce
(``notebooks/1_data_cleaning.ipynb:351-358``, ``4_graphx.ipynb:1204``), CSV
sink with header (``4_graphx.ipynb:1213-1216``), JDBC read/write
(``streaming/spark_to_postgres.py:26-34``), ``spark.range``
(``spark_to_postgres.py:11``).

Engine stance: DECLARED schemas preferred over inference (inference reads the
data twice and locks a sample-derived schema — wrong at 100 TB); writes use
``repartition`` rather than ``coalesce`` when write parallelism matters
(coalesce caps the parallelism of every upstream stage it folds into).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """CSV scan. Pass a schema; ``infer_schema=True`` reproduces the
    reference's convenience mode for ad-hoc exploration only."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    num_files: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` gives partition-pruned reads downstream;
    ``num_files`` controls output file count via ``repartition`` (NOT
    ``coalesce`` — see module docstring)."""
    out = df.repartition(num_files) if num_files else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    num_files: int | None = None,
) -> None:
    out = df.repartition(num_files) if num_files else df
    out.write.mode(mode).option("header", header).csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict,
    mode: str = "append",
    batch_size: int = 10_000,
) -> None:
    """JDBC batch sink — executes per-partition on executors. ``batchsize``
    bounds round-trips; pair with ``df.repartition(n)`` to control the number
    of concurrent connections hitting the database."""
    (
        df.write.mode(mode)
        .option("batchsize", batch_size)
        .jdbc(url, table, properties=properties)
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan; with partition bounds it reads in parallel (one query per
    stride) instead of a single-connection full scan."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions or 8)
        )
    return reader.load()


def range_source(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    return spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table — the co-located-join
    primitive: two tables bucketed identically on the join key join WITHOUT
    any shuffle (asserted in tests/test_plans.py::test_bucketed_join_no_shuffle).
    At 100 TB this is how repeated fact-fact joins amortize their shuffle
    once at write time."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """JSON-lines scan with a DECLARED schema — inference on JSON is a full
    extra pass over the data (at 100 TB, an extra 100 TB read), so it is not
    offered here; use ``F.from_json`` for embedded JSON columns instead."""
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line — splittable, append-friendly)."""
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar/pushdown properties as parquet; carried
    schema, vectorized reader."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
