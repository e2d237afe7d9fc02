"""Runtime scan-replay audit: actual parquet file opens per query.

Static plan inspection (``plans.parquet_scan_count``) sees only the FINAL
plan — work that executes during query *construction* (eager
``localCheckpoint`` builds, iterative-operator persists, landmark frames
evaluated inside a checkpoint) never appears in it. That blind spot hid
the q194 defect: a landmark frame whose lineage re-ran the co-occurrence
edge build twice before the BFS even started.

This audit measures what actually ran: for each declared query it sums
the ``number of files read`` metric over every SQL execution the query
triggers (construction + collect), via the Spark UI REST API. Cached /
checkpointed block reads do NOT count — only real file opens do — so the
number is exactly "how many times did this query open parquet files".

Interpretation: at the test SFs every table is ONE parquet file, so
``files_read`` counts table-scan events. The floor is the number of
distinct tables the query loads; a multiple of it means the same table
was scanned repeatedly. That is NOT automatically a defect:
  - scans pruned to DISJOINT columns read the same total bytes as one
    wide scan (q199/q227 — columnar storage makes them free);
  - genuine multi-pass algorithms re-stream the fact on purpose
    (q213/q214's second corpus pass over a broadcast ratio table);
  - TPC-H-shape joins read many distinct tables once each.
The audit flags candidates for HUMAN review; the per-query scan budgets
pinned in tests/test_plans.py are the adjudicated truth.

Usage: python tools/replay_audit.py [query ...]   (default: all)
Env:   REPLAY_AUDIT_SF (default /root/testdata/sf0.01)
Writes one JSON line per query to stdout and a sorted summary to stderr.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession

SF = os.environ.get("REPLAY_AUDIT_SF", "/root/testdata/sf0.01")


def _fetch(url):
    return json.load(urllib.request.urlopen(url, timeout=30))


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.retainedExecutions", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = _fetch(f"{ui}/api/v1/applications")[0]["id"]
    sql_url = f"{ui}/api/v1/applications/{app}/sql"

    def executions(min_id):
        out, offset = [], 0
        while True:
            page = _fetch(
                f"{sql_url}?details=true&planDescription=false"
                f"&offset={offset}&length=200"
            )
            if not page:
                return [e for e in out if e["id"] >= min_id]
            out.extend(page)
            offset += 200

    def files_read_since(min_id):
        total = 0
        for e in executions(min_id):
            for n in e.get("nodes", []):
                for m in n.get("metrics", []):
                    if m.get("name") == "number of files read":
                        total += int(m["value"].replace(",", ""))
        return total

    import __spark_entry__ as E

    queries = E.queries()
    only = set(sys.argv[1:])
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    next_id = 0
    rows = []
    for name, fn in queries.items():
        try:
            t0 = time.time()
            df = fn(spark, SF)
            df.collect()
            elapsed = round(time.time() - t0, 2)
            # small settle so the status store catches up
            time.sleep(0.2)
            execs = executions(next_id)
            files = sum(
                int(m["value"].replace(",", ""))
                for e in execs
                for n in e.get("nodes", [])
                for m in n.get("metrics", [])
                if m.get("name") == "number of files read"
            )
            next_id = max([e["id"] + 1 for e in execs], default=next_id)
            row = {"query": name, "files_read": files, "sec": elapsed}
        except Exception as ex:  # noqa: BLE001 — audit must not die mid-sweep
            row = {"query": name, "error": str(ex)[:200]}
            next_id = max(
                [e["id"] + 1 for e in executions(next_id)], default=next_id
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if "files_read" in r]
    ok.sort(key=lambda r: -r["files_read"])
    print("\n== top file-open counts (review > ~6) ==", file=sys.stderr)
    for r in ok[:25]:
        print(f"  {r['files_read']:4d}  {r['query']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
