"""Per-query JOB profile: job count, wall seconds, per-job descriptions.

The optimization guide's §1 instrument for ITERATIVE operators: their cost
at small scale is jobs × fixed scheduling overhead, which the stage dump
(profile_query.py) under-attributes because each job's stages are tiny.
This tool counts the jobs a query triggers end-to-end (builder + noop
materialization) from the REST API — the before/after evidence for
lazy-checkpoint job fusion (one job per iteration instead of two).

Usage: python tools/profile_jobs.py q23_pagerank [more...]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _fetch(url):
    return json.load(urllib.request.urlopen(url, timeout=30))


def main() -> None:
    from bigdatafraude_ml_graphx_spark import get_spark
    from bigdatafraude_ml_graphx_spark import registry as q

    names = sys.argv[1:]
    spark = get_spark(
        app_name="profile-jobs", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = _fetch(f"{ui}/api/v1/applications")[0]["id"]

    def jobs():
        return _fetch(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded")

    for name in names:
        fn = q.QUERIES[name]
        seen = {j["jobId"] for j in jobs()}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        new = sorted(
            (j for j in jobs() if j["jobId"] not in seen),
            key=lambda j: j["jobId"],
        )
        n_stages = sum(len(j["stageIds"]) for j in new)
        n_tasks = sum(j["numCompletedTasks"] for j in new)
        print(
            f"\n=== {name}: wall {wall:.2f}s, {len(new)} jobs, "
            f"{n_stages} stages, {n_tasks} tasks"
        )
        for j in new:
            print(
                f"  job {j['jobId']:>4} stages={len(j['stageIds'])} "
                f"tasks={j['numCompletedTasks']:>4}  "
                f"{(j.get('name') or '')[:100]}"
            )
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
