"""Static plan sweeps over every declared query — the round-audit trio.

Complements ``tools/replay_audit.py`` (runtime file opens): these three
checks read each query's FINAL formatted plan and flag shapes that break
at 100 TB. Detector subtleties learned the hard way in round 7 — encoded
here so later rounds don't re-derive them wrong:

1. **serial-windows** — unpartitioned+ordered Window nodes (all rows to
   one task). The formatted plan prints ``Arguments: [fns], [part], [ord]``
   for partitioned+ordered windows but only TWO groups otherwise — a
   2-group node is serial ONLY when the last group carries ``ASC``/
   ``DESC`` (order exprs); bare columns mean partitioned-unordered
   (whole-partition aggregates — parallel, fine). WindowGroupLimit
   nodes with ``Partial``/``Final`` in their arguments are the
   DISTRIBUTED rank-limit pushdown — the desired top-k shape, never
   flag them. Known-good hits: two-phase crossings over bounded
   value-count tables (q221/q222/q128/q126/q197/q198) and the serial
   baselines kept beside scaled twins (q104/q114).

2. **scan-counts** — physical scans per source table, counted from
   ``Location:`` detail lines (ONE per scan node — unlike the literal
   ``Scan parquet`` text, which the formatted plan lists twice: tree +
   details; ``plans.parquet_scan_count`` counts that doubled form).
   N same-table scans are a defect ONLY when they repeat the same
   columns/work; disjoint-column scans are free in columnar storage
   (q199/q227), and TPC-H shapes read many distinct tables once each.

3. **unpruned-scans** — scans whose ReadSchema covers ≥ (width−1)
   columns of a ≥6-column table. Legit when the query semantically
   needs the full row (null census q05, CDC latest q74, as-of payload
   carries q50/q51/q123).

Usage: python tools/plan_sweep.py [serial-windows|scan-counts|unpruned-scans] [query ...]
Env:   PLAN_SWEEP_SF (default /root/testdata/sf0.001)
"""

import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF = os.environ.get("PLAN_SWEEP_SF", "/root/testdata/sf0.001")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def serial_windows(plan: str) -> list[str]:
    """Order-only (unpartitioned) Window argument strings — serial sorts."""
    hits = []
    for m in re.finditer(
        r"\(\d+\) Window\n(?:Input[^\n]*\n)?Arguments: ([^\n]*)", plan
    ):
        groups = re.split(r"\], \[", m.group(1))
        last = groups[-1]
        if len(groups) == 2 and (" ASC" in last or " DESC" in last):
            hits.append(last[:120])
    return hits


def scan_counts(plan: str) -> dict[str, int]:
    """Physical parquet scans per table (formatted plan double-lists)."""
    files = re.findall(r"Location:[^\n]*/(\w+)\.parquet", plan)
    out: dict[str, int] = {}
    for t in files:
        out[t] = out.get(t, 0) + 1
    return out


def unpruned_scans(plan: str, widths: dict[str, int]) -> list[tuple]:
    hits = []
    for m in re.finditer(
        r"Location: [^\n]*/(\w+)\.parquet[^\n]*\n(?:[^\n]*\n)*?"
        r"ReadSchema: struct<([^>]*)>",
        plan,
    ):
        t, schema = m.group(1), m.group(2)
        ncols = len([c for c in schema.split(",") if c])
        w = widths.get(t, 0)
        if w >= 6 and ncols >= w - 1:
            hits.append((t, ncols, w))
    return hits


def main() -> int:
    from pyspark.sql import SparkSession

    mode = sys.argv[1] if len(sys.argv) > 1 else "scan-counts"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from bigdatafraude_ml_graphx_spark.plans import formatted_plan

    widths = {
        t: len(spark.read.parquet(f"{SF}/{t}.parquet").columns)
        for t in TABLES
    }
    queries = E.queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    for name, fn in queries.items():
        try:
            plan = formatted_plan(fn(spark, SF))
        except Exception as ex:  # noqa: BLE001 — sweep must finish
            print(json.dumps({"query": name, "error": str(ex)[:120]}))
            continue
        if mode == "serial-windows":
            hits = serial_windows(plan)
        elif mode == "unpruned-scans":
            hits = unpruned_scans(plan, widths)
        else:
            counts = scan_counts(plan)
            hits = {t: c for t, c in counts.items() if c >= 2}
        if hits:
            print(json.dumps({"query": name, mode: hits}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
