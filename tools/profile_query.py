"""Per-query stage profile: wall seconds, shuffle bytes, spill, input bytes.

Runs selected declared queries (or the named x_ bench blocks) in a
bench-equivalent engine session (get_spark on local[$SPARK_GRAFT_CPUS],
sf from $SPARK_GRAFT_SF_DIR) with the UI enabled, forces full
materialization with the noop sink, and then dumps every STAGE the query
triggered from the REST API — the measurement step of the optimization
guide (§1): before touching an operator, know which exchange/aggregate
actually owns the wall-clock.

Usage: python tools/profile_query.py q250_dup_cluster_stats [more...]
Output: per query, one line per stage sorted by executorRunTime, plus a
shuffle/input/spill roll-up. Timings here include profiling overhead —
use bench.py numbers for before/after claims; use THIS to rank stages.
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
        app_name="profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = _fetch(f"{ui}/api/v1/applications")[0]["id"]

    def stages():
        return _fetch(f"{ui}/api/v1/applications/{app}/stages?status=complete")

    for name in names:
        fn = q.QUERIES[name]
        seen = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = fn(spark, SF)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -s["executorRunTime"])
        tot_sh_w = sum(s["shuffleWriteBytes"] for s in new)
        tot_in = sum(s["inputBytes"] for s in new)
        tot_spill = sum(s["diskBytesSpilled"] for s in new)
        tot_run = sum(s["executorRunTime"] for s in new)
        print(
            f"\n=== {name}: wall {wall:.2f}s (build {t_build:.2f}s), "
            f"{len(new)} stages, execRun {tot_run/1000:.1f}s, "
            f"input {tot_in/1e6:.0f}MB, shuffleW {tot_sh_w/1e6:.1f}MB, "
            f"spill {tot_spill/1e6:.0f}MB"
        )
        for s in new[:14]:
            nm = s.get("description") or s["name"]
            print(
                f"  stage {s['stageId']:>4} {s['numCompleteTasks']:>4}t "
                f"run {s['executorRunTime']/1000:7.2f}s "
                f"in {s['inputBytes']/1e6:7.1f}MB "
                f"shR {s['shuffleReadBytes']/1e6:7.1f}MB "
                f"shW {s['shuffleWriteBytes']/1e6:7.1f}MB "
                f"spill {s['diskBytesSpilled']/1e6:6.1f}MB  {nm[:80]}"
            )
        # cache hygiene between queries, mirroring bench.py
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
