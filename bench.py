#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line with per-query wall seconds.

Each query is forced to full materialization with a ``noop`` write (distributed
sink, no driver collect) — measuring the whole plan including shuffles, not
just the driver round-trip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatafraude_ml_graphx_spark import get_spark
from bigdatafraude_ml_graphx_spark import registry as q


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM paths the queries actually hit — vectorized parquet
    # reader, shuffle machinery, broadcast exchange — on the two smallest
    # tables, so per-query timings reflect execution, not first-touch
    # initialization of each subsystem.
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    (
        nation.join(region.hint("broadcast"), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    for name in sorted(q.QUERIES):
        fn = q.QUERIES[name]
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
