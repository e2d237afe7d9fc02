"""IO round-trip tests (SURVEY §2.1): CSV with declared schema, partitioned
parquet with pruning, range source."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.plans import formatted_plan
from bigdatafraude_ml_graphx_spark.sources import (
    range_source,
    read_csv,
    read_parquet,
    write_csv,
    write_parquet,
)


def test_csv_round_trip_declared_schema(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path, num_files=2)
    back = read_csv(
        spark,
        path,
        schema="o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    )
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    assert back.exceptAll(orders).count() == 0


def test_parquet_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=("o_orderstatus",))
    back = read_parquet(spark, path)
    assert back.count() == orders.count()
    pruned = back.filter(F.col("o_orderstatus") == "F")
    # Partition pruning: the non-matching partitions never appear in the scan.
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan


def test_range_source(spark):
    df = range_source(spark, 1000, num_partitions=4)
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 4


def test_json_round_trip_declared_schema(spark, tmp_path):
    from bigdatafraude_ml_graphx_spark.sources.io import read_json, write_json

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, s string, v double"
    )
    path = str(tmp_path / "json_rt")
    write_json(df, path)
    back = read_json(spark, path, "id long, s string, v double")
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_round_trip_carries_schema(spark, tmp_path):
    from bigdatafraude_ml_graphx_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "x", [1.0, 2.0]), (2, "y", [])],
        "id long, s string, emb array<double>",
    )
    path = str(tmp_path / "orc_rt")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema  # self-describing, like parquet
    assert back.count() == 2


def test_orc_filter_pushdown(spark, tmp_path):
    from bigdatafraude_ml_graphx_spark.plans.inspect import formatted_plan
    from bigdatafraude_ml_graphx_spark.sources.io import read_orc, write_orc

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    path = str(tmp_path / "orc_pd")
    write_orc(df, path)
    scan = read_orc(spark, path).filter(F.col("id") > 50)
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,50)]" in formatted_plan(scan)


def test_jdbc_round_trip_embedded_derby(spark, tmp_path):
    """Real JDBC round-trip against the Derby embedded driver that ships in
    Spark's own jars — no external DB needed. Exercises the same
    write-then-read shape as the reference's Postgres flow
    (/root/reference/streaming/spark_to_postgres.py:26-34)."""
    from bigdatafraude_ml_graphx_spark.sources.io import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bob", None), (3, "eve", -1.0)],
        "id bigint, name string, score double",
    )
    write_jdbc(df, url, "people", props, mode="overwrite")
    back = read_jdbc(spark, url, "people", props)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # partitioned parallel read: same rows, one query per stride
    par = read_jdbc(
        spark, url, "people", props,
        partition_column="id", lower_bound=0, upper_bound=4, num_partitions=2,
    )
    assert par.rdd.getNumPartitions() == 2
    assert sorted(map(tuple, par.collect())) == sorted(map(tuple, df.collect()))


def test_python_datasource_synth_docs(spark):
    """Spark 4 Python DataSource: planned partitions drive parallelism, and
    rows are a pure function of (seed, doc_id) — identical across partition
    counts and reruns."""
    from bigdatafraude_ml_graphx_spark.sources.pydatasource import (
        register_synth_docs,
    )

    register_synth_docs(spark)
    df = (
        spark.read.format("synth_docs")
        .option("n", 100)
        .option("seed", 7)
        .option("partitions", 4)
        .load()
    )
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 4
    assert df.columns == ["doc_id", "text", "lang"]
    rows = {r.doc_id: (r.text, r.lang) for r in df.collect()}
    assert len(rows) == 100  # ids unique, no overlap between slices
    # repartitioned read yields byte-identical rows (placement-independent)
    df2 = (
        spark.read.format("synth_docs")
        .option("n", 100)
        .option("seed", 7)
        .option("partitions", 9)
        .load()
    )
    assert {r.doc_id: (r.text, r.lang) for r in df2.collect()} == rows
    # different seed -> different corpus
    df3 = (
        spark.read.format("synth_docs")
        .option("n", 100)
        .option("seed", 8)
        .option("partitions", 4)
        .load()
    )
    assert {r.doc_id: (r.text, r.lang) for r in df3.collect()} != rows


def test_observation_metrics_single_pass(spark, sf_dir):
    """df.observe(): data-quality counters (row count, null count, sum)
    collected as a side effect of the SAME job — no second scan. The 100 TB
    pattern for ingest validation: metrics ride the write action."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("ingest_qc")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.max("l_shipdate").alias("max_shipdate"),
    )
    n = observed.count()  # one action drives both the count and the metrics
    m = obs.get
    assert m["n_rows"] == n
    assert m["null_qty"] == 0
    assert m["max_shipdate"] is not None


def test_python_udtf_span_expansion(spark):
    """Spark 4 Python UDTF: lateral-join expansion of (start, length) span
    specs into per-span rows — the table-function API surface. (Policy note:
    UDTFs are Python-side like UDFs; the engine uses them for API parity and
    irregular expansions only — regular explodes stay JVM-side, q53.)"""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="span_idx int, start int, end int")
    class SpanExpander:
        def eval(self, total: int, chunk: int):
            idx, pos = 0, 0
            while pos < total:
                yield idx, pos, min(pos + chunk, total)
                idx += 1
                pos += chunk

    spark.udtf.register("span_expander", SpanExpander)
    rows = spark.sql(
        """
        SELECT t.n, s.span_idx, s.start, s.end
        FROM VALUES (10), (5), (0) AS t(n),
             LATERAL span_expander(t.n, 4) AS s
        ORDER BY t.n, s.span_idx
        """
    ).collect()
    got = [(r.n, r.span_idx, r.start, r.end) for r in rows]
    assert got == [
        (5, 0, 0, 4), (5, 1, 4, 5),
        (10, 0, 0, 4), (10, 1, 4, 8), (10, 2, 8, 10),
    ]
    # DataFrame-API invocation of the same UDTF
    df = SpanExpander(lit(6), lit(3))
    assert [(r.start, r.end) for r in df.collect()] == [(0, 3), (3, 6)]


def test_ignore_corrupt_files_scan(spark, tmp_path):
    """A corrupt parquet part must not kill a directory scan when
    spark.sql.files.ignoreCorruptFiles is on — at 100 TB some corrupt
    objects are a certainty; the scan must degrade, not abort."""
    import os

    d = str(tmp_path / "mixed")
    spark.range(100).write.mode("overwrite").parquet(d)
    with open(os.path.join(d, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a real parquet file")
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert spark.read.parquet(d).count() == 100
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_dynamic_partition_overwrite(spark, tmp_path):
    """partitionOverwriteMode=dynamic replaces ONLY the partitions present
    in the incoming batch — the idempotent daily-reload pattern; static mode
    would truncate the whole table."""
    import pyspark.sql.functions as F2

    d = str(tmp_path / "dpo")
    base = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)], "day string, v int"
    )
    base.write.partitionBy("day").mode("overwrite").parquet(d)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = spark.createDataFrame([("2024-01-02", 99)], "day string, v int")
        patch.write.partitionBy("day").mode("overwrite").parquet(d)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    out = {
        (r.day, r.v)
        for r in spark.read.parquet(d)
        .select(F2.col("day").cast("string").alias("day"), "v")  # partition col
        .collect()  # is date-inferred on read; compare canonically as strings
    }
    assert out == {("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 99)}
