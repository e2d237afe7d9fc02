"""Streaming view of the testdata ``events`` table (file-replay source).

Mirrors ``catalog.load_table``'s TIMESTAMP(NANOS) handling for the streaming
reader: declared schema with ``ts`` as raw nanos (``nanosAsLong``), then the
same timezone-independent TIMESTAMP_NTZ reconstruction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(_staged_dir(sf_dir))
        .withColumn("ts", F.expr(_NTZ))
    )
