"""Physical-plan inspection helpers.

The scale contract of this engine (SURVEY §4) is checkable, not aspirational:
filters reach the parquet scan, projections prune columns, dimension joins
broadcast, top-k compiles to TakeOrderedAndProject, hot paths stay inside
whole-stage codegen. These helpers read ``explain("formatted")`` output so
tests (tests/test_plans.py) assert the plan SHAPE, which is what survives a
100× scale-up — wall-clock at sf0.1 does not.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True iff the scan node carries non-empty PushedFilters."""
    plan = formatted_plan(df)
    m = re.search(r"PushedFilters: \[(.+?)\]", plan)
    return bool(m and m.group(1).strip())


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) file scan — the column-pruning
    check: a 2-column projection must not read 16 columns."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def uses_window_group_limit(df: DataFrame) -> bool:
    """True iff the plan contains WindowGroupLimit — Spark 3.5+'s
    rank-limit pushdown for ``row_number()/rank() ... WHERE rn <= k``
    windows: each group keeps a k-row heap instead of fully sorting, so a
    top-k-per-group window never materializes or sorts whole groups. The
    queries that rely on it (q13/q147 shapes) pin the node in
    tests/test_plans.py — an optimizer assumption made a tested contract
    (VERDICT r5 item 5)."""
    return "WindowGroupLimit" in formatted_plan(df)


def parquet_scan_count(df: DataFrame) -> int:
    """Number of parquet file-scan nodes in the OPTIMIZED plan — the
    scan-replay check for iterative/recursive queries: a loop or
    WITH RECURSIVE whose per-iteration plan re-reads base relations turns
    a linear traversal into a scan bottleneck at 100× (the q173 defect,
    VERDICT r6 item 1). Post-setup iteration plans must show 0 — the
    edge/frontier frames live in localCheckpoint-ed blocks, not files."""
    plan = formatted_plan(df)
    return len(re.findall(r"Scan parquet", plan))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen regions — wider/fewer is better."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))


def executed_plan(df: DataFrame) -> str:
    """String of the EXECUTED physical plan — after an action has run,
    AQE re-planning is visible here (``isFinalPlan=true``, runtime
    broadcast demotions, ``skew=true`` on re-split sort-merge joins)
    where ``explain()`` before execution only shows the initial plan.
    Call an action on ``df`` first; without one this returns the
    pre-execution adaptive plan."""
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
