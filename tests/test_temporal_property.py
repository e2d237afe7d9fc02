"""Property-based check: asof_join vs a brute-force per-row reference.

Hypothesis drives randomized probe/build sets (duplicate timestamps, missing
keys, empty sides, NULL build values, NULL keys); the Spark result must equal
an O(P×B) Python scan. One Spark job per example, so examples are few but
adversarially shrunk.

NULL coverage matters: attaching columns independently (the pre-fix design)
silently mixed values across build rows exactly when the as-of row had a NULL
attach column — a case the original generator never produced.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from bigdatafraude_ml_graphx_spark.operators.temporal import asof_join

_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("rid", LongType()),
        StructField("value", DoubleType()),
    ]
)

_BASE = dt.datetime(2024, 1, 1)

_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 2)),  # key — few keys + NULLs
    st.integers(0, 8),  # minute — duplicates likely
    st.one_of(st.none(), st.integers(0, 100)),  # payload — NULLs common
)


def _frames(spark, rows):
    data = [
        (k, _BASE + dt.timedelta(minutes=m), i, None if v is None else float(v))
        for i, (k, m, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, _SCHEMA) if data else spark.createDataFrame([], _SCHEMA)


def _brute_force(probe_rows, build_rows):
    """latest build (ts <= probe ts) per key; ties -> max rid; NULL keys
    match nothing (SQL equi-join semantics). Returns (rid, value) of the
    matched build row — BOTH from the same row."""
    out = {}
    for i, (pk, pm, _pv) in enumerate(probe_rows):
        best = None
        if pk is not None:
            for j, (bk, bm, bv) in enumerate(build_rows):
                if bk is None or bk != pk or bm > pm:
                    continue
                # order by (ts, rid): later ts wins, then higher rid
                if best is None or (bm, j) > (best[0], best[1]):
                    best = (bm, j, bv)
        out[i] = (None, None) if best is None else (
            best[1],
            None if best[2] is None else float(best[2]),
        )
    return out


@given(st.lists(_row, max_size=8), st.lists(_row, max_size=8))
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_brute_force(spark, probe_rows, build_rows):
    probe = _frames(spark, probe_rows)
    build = _frames(spark, build_rows)
    got = asof_join(
        probe,
        build,
        key="k",
        probe_ts="ts",
        build_ts="ts",
        attach={"b_rid": "rid", "b_val": "value"},
        tie_break="rid",
    )
    actual = {r["rid"]: (r["b_rid"], r["b_val"]) for r in got.collect()}
    expected = _brute_force(probe_rows, build_rows)
    assert actual == expected
