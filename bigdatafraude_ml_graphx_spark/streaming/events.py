"""Streaming view of the testdata ``events`` table (file-replay source).

Mirrors ``catalog.load_table``'s TIMESTAMP(NANOS) handling for the streaming
reader. The batch scan is probed (schema-only, no job) to learn how this
Spark reads the nanos column:

* native TIMESTAMP_NTZ (Spark >= 4.1) — declare ``ts timestamp_ntz`` in the
  stream schema and pass it through; the reader truncates to micros exactly
  as DuckDB does. Declaring ``ts long`` here would be WRONG on these
  Sparks: the reader casts the timestamp to long as MICROS, silently
  shifting every downstream window by 10^3 (observed: all events landing in
  1970-01-20).
* raw nanos as BIGINT (older Sparks honoring
  ``spark.sql.legacy.parquet.nanosAsLong``) — declare ``ts long`` and
  rebuild TIMESTAMP_NTZ with exact interval arithmetic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA_NATIVE = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)

EVENTS_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string,"
    " value double, props string"
)

_NTZ = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
    "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
)


def _staged_dir(sf_dir: str) -> str:
    """The file stream source requires a DIRECTORY; the testdata tables are
    single files. Stage a tmp dir containing a symlink to the parquet file
    (read-only testdata is never touched)."""
    import hashlib

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = f"/tmp/spark_graft_stream_{key}"
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    if not os.path.islink(link):
        os.symlink(target, link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed in newer Sparks; native read handles nanos
    probe = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    )  # schema-only: no job runs
    if dict(probe.dtypes).get("ts") not in ("bigint", "long"):
        return spark.readStream.schema(EVENTS_SCHEMA_NATIVE).parquet(
            _staged_dir(sf_dir)
        )
    return (
        spark.readStream.schema(EVENTS_SCHEMA_NANOS)
        .parquet(_staged_dir(sf_dir))
        .withColumn("ts", F.expr(_NTZ))
    )
