"""SparkSession factory with scale-ready defaults.

The reference pins ``spark.sql.shuffle.partitions=2`` and hand-sizes everything
(``/root/reference/streaming/streaming_config.yaml:75-76``,
``scripts/start_streaming.sh``). The engine instead turns on AQE so Spark
re-plans partition counts / skew joins at runtime — the setting that actually
survives a 1000-executor, 100 TB deployment — and keeps Kryo + G1GC from the
reference's ``spark-config/spark-defaults.conf:5-7``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "bigdatafraude-ml-graphx-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Defaults are tuned so the same logical plans behave at local[32] test scale
    and on a real cluster:

    * AQE on (coalesce post-shuffle partitions, skew-join splitting) — replaces
      hand-pinned shuffle partition counts.
    * Session timezone UTC — timestamp semantics identical to the DuckDB
      correctness oracle.
    * Arrow enabled — fast toPandas / pandas_udf batches.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # Owned explicitly, not inherited: Spark 3.4+ defaults this on, but a
        # cluster defaults file (or older Spark) can override it — the runtime
        # bloom-filter join-pushdown plan contract (tests/test_plans.py) must
        # test the engine's own configuration, not a deployment accident.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return spark
