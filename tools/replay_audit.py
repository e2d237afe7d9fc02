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
The audit flags candidates for HUMAN review; the adjudicated truth is
``tools/replay_budgets.json`` (per-query max opens), enforced by
``tests/test_replay_budgets.py`` and by ``--check`` below.

Usage:
  python tools/replay_audit.py [query ...]          sweep (default: all)
  python tools/replay_audit.py --check [query ...]  sweep + enforce
      tools/replay_budgets.json: exit 1 if any query opens more files
      than its budget (unbudgeted queries are reported, not fatal).
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

SF = os.environ.get("REPLAY_AUDIT_SF", "/root/testdata/sf0.01")
BUDGET_FILE = os.path.join(os.path.dirname(__file__), "replay_budgets.json")


def _fetch(url):
    return json.load(urllib.request.urlopen(url, timeout=30))


class ExecutionMeter:
    """Incremental reader of the Spark UI /sql execution list.

    Pages MONOTONICALLY: execution ids are dense and the REST list is
    ordered by id, so each call starts paging at the first id not yet
    seen instead of re-walking the whole history (a 228-query sweep is
    O(n) REST entries total, and early-execution eviction by
    ``spark.ui.retainedExecutions`` can no longer undercount — evicted
    entries are always ones already consumed)."""

    def __init__(self, spark):
        self._ui = spark.sparkContext.uiWebUrl
        app = _fetch(f"{self._ui}/api/v1/applications")[0]["id"]
        self._sql_url = f"{self._ui}/api/v1/applications/{app}/sql"
        self.next_id = 0
        self.skip_current()

    def _executions_since(self, min_id):
        # REST `offset` indexes the RETAINED list, not execution ids: after
        # eviction (spark.ui.retainedExecutions) index i holds id i + evicted.
        # Probe the head once to learn the shift, then start at the exact
        # index of the first unconsumed id — O(new entries) per call.
        head = _fetch(f"{self._sql_url}?offset=0&length=1")
        if not head:
            return []
        first_id = head[0]["id"]
        out, offset = [], max(0, min_id - first_id)
        while True:
            page = _fetch(
                f"{self._sql_url}?details=true&planDescription=false"
                f"&offset={offset}&length=200"
            )
            if not page:
                return [e for e in out if e["id"] >= min_id]
            out.extend(page)
            offset += len(page)

    def files_read_since_last(self):
        """Sum of "number of files read" over executions not yet consumed;
        advances the high-water mark."""
        execs = self._executions_since(self.next_id)
        self.next_id = max(
            [e["id"] + 1 for e in execs], default=self.next_id
        )
        return sum(
            int(m["value"].replace(",", ""))
            for e in execs
            for n in e.get("nodes", [])
            for m in n.get("metrics", [])
            if m.get("name") == "number of files read"
        )

    def skip_current(self):
        """Advance past everything already executed (so a shared session —
        e.g. the pytest fixture — starts the audit from a clean mark)."""
        execs = self._executions_since(self.next_id)
        self.next_id = max(
            [e["id"] + 1 for e in execs], default=self.next_id
        )


def audit_queries(spark, queries, sf=SF, on_row=None):
    """Run each query end-to-end and measure its parquet file opens.

    ``queries`` is a ``name -> callable(spark, sf_dir) -> DataFrame``
    dict (the driver contract's ``queries()`` shape). Returns a list of
    ``{"query", "files_read", "sec"}`` rows (``{"query", "error"}`` on
    failure — the sweep never dies mid-run)."""
    meter = ExecutionMeter(spark)
    rows = []
    for name, fn in queries.items():
        try:
            t0 = time.time()
            fn(spark, sf).collect()
            elapsed = round(time.time() - t0, 2)
            time.sleep(0.2)  # small settle so the status store catches up
            row = {
                "query": name,
                "files_read": meter.files_read_since_last(),
                "sec": elapsed,
            }
        except Exception as ex:  # noqa: BLE001 — audit must not die mid-sweep
            row = {"query": name, "error": str(ex)[:200]}
            meter.files_read_since_last()  # drain, keep the mark moving
        rows.append(row)
        if on_row is not None:
            on_row(row)
    return rows


def load_budgets():
    with open(BUDGET_FILE) as f:
        return json.load(f)


def check_budgets(rows, budgets):
    """Return (violations, unbudgeted): queries opening more files than
    budgeted, and measured queries with no budget entry yet."""
    violations, unbudgeted = [], []
    for r in rows:
        if "files_read" not in r:
            violations.append({**r, "budget": None})
            continue
        b = budgets.get(r["query"])
        if b is None:
            unbudgeted.append(r)
        elif r["files_read"] > b:
            violations.append({**r, "budget": b})
    return violations, unbudgeted


def main() -> int:
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    check = "--check" in args
    only = {a for a in args if not a.startswith("--")}

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.retainedExecutions", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    queries = E.queries()
    if only:
        missing = only - set(queries)
        assert not missing, f"unknown query names: {sorted(missing)}"
        queries = {k: v for k, v in queries.items() if k in only}

    rows = audit_queries(
        spark, queries, SF, on_row=lambda r: print(json.dumps(r), flush=True)
    )

    ok = sorted(
        (r for r in rows if "files_read" in r),
        key=lambda r: -r["files_read"],
    )
    print("\n== top file-open counts (review > ~6) ==", file=sys.stderr)
    for r in ok[:25]:
        print(f"  {r['files_read']:4d}  {r['query']}", file=sys.stderr)

    if check:
        violations, unbudgeted = check_budgets(rows, load_budgets())
        for r in unbudgeted:
            print(f"UNBUDGETED {r['query']}: {r['files_read']}", file=sys.stderr)
        for r in violations:
            print(
                f"VIOLATION {r['query']}: "
                f"{r.get('files_read', r.get('error'))} > {r['budget']}",
                file=sys.stderr,
            )
        return 1 if violations else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
