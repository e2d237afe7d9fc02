"""Unit tests for tools/plan_sweep.py's detectors against canned
formatted-plan snippets — pins the parsing subtleties (2-group Window
arguments, WindowGroupLimit exclusion, single-listed Location lines) so a
Spark upgrade that changes explain() output fails loudly here instead of
silently blinding the round audits."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from plan_sweep import scan_counts, serial_windows, unpruned_scans

SERIAL = """(15) Window
Input [2]: [m_cents#97L, _cnt#79L]
Arguments: [sum(_cnt#79L) windowspecdefinition(m_cents#97L ASC NULLS FIRST, specifiedwindowframe(RangeFrame, unboundedpreceding$(), currentrow$())) AS _we0#91L], [m_cents#97L ASC NULLS FIRST]
"""

PARTITIONED_UNORDERED = """(7) Window
Input [2]: [doc_id#0L, n#1L]
Arguments: [count(1) windowspecdefinition(doc_id#0L, specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS n_grams#11L], [doc_id#0L]
"""

PARTITIONED_ORDERED = """(9) Window
Input [3]: [k#0, v#1, rn#2]
Arguments: [row_number() windowspecdefinition(k#0, v#1 DESC NULLS LAST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS rn#2], [k#0], [v#1 DESC NULLS LAST]
"""

GROUP_LIMIT = """(11) WindowGroupLimit
Input [2]: [o_totalprice#2549, x#1]
Arguments: [o_totalprice#2549 DESC NULLS LAST], rank(o_totalprice#2549), 3, Partial
"""

SCANS = """(1) Scan parquet
Output [2]: [a#1L, b#2]
Location: InMemoryFileIndex [file:/data/sf/orders.parquet]
ReadSchema: struct<o_custkey:bigint>

(2) Scan parquet
Output [1]: [c#3]
Location: InMemoryFileIndex [file:/data/sf/orders.parquet]
ReadSchema: struct<o_orderstatus:string,o_orderpriority:string,o_custkey:bigint,o_orderdate:date,o_totalprice:double,o_orderkey:bigint>

(3) Scan parquet
Location: InMemoryFileIndex [file:/data/sf/nation.parquet]
ReadSchema: struct<n_nationkey:bigint>
"""


def test_serial_window_detected():
    assert len(serial_windows(SERIAL)) == 1


def test_partitioned_unordered_window_not_flagged():
    # Bare columns in the 2nd group = partition spec (whole-partition
    # aggregate, parallel) — the round-7 false-positive class.
    assert serial_windows(PARTITIONED_UNORDERED) == []


def test_partitioned_ordered_window_not_flagged():
    assert serial_windows(PARTITIONED_ORDERED) == []


def test_window_group_limit_not_flagged():
    # Partial/Final WindowGroupLimit is the distributed rank-limit
    # pushdown — the desired top-k shape.
    assert serial_windows(GROUP_LIMIT) == []


def test_scan_counts_physical_per_location_line():
    assert scan_counts(SCANS) == {"orders": 2, "nation": 1}


def test_unpruned_detects_full_width_scan_only():
    widths = {"orders": 6, "nation": 4}
    hits = unpruned_scans(SCANS, widths)
    # scan (2) reads all 6 orders columns; scan (1) reads 1 of 6; the
    # 4-column nation table is below the width threshold entirely.
    assert hits == [("orders", 6, 6)]
