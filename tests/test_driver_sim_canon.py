"""Unit tests for tools/driver_sim.py's canon() — the local gate's
row-comparison semantics. If canon drifts from the real driver's compare
(float repr fidelity, NaN/None folding, order-insensitive stable sort,
column-name sorting), the local gate green-lights diffs the driver would
fail. Pure pandas, no Spark."""

import math
import os
import sys

import pandas as pd

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

# driver_sim executes the gate at import; pull canon without running it.
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "_canon_src",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "driver_sim.py",
    ),
)
_src = open(_spec.origin).read()
_ns: dict = {"math": math, "pd": pd}
exec(  # noqa: S102 — extract canon() only; importing would run the gate
    compile(
        _src[_src.index("def canon") : _src.index("queries = E.queries()")],
        "driver_sim.canon",
        "exec",
    ),
    _ns,
)
canon = _ns["canon"]


def test_row_order_insensitive():
    a = canon(pd.DataFrame({"x": [2, 1], "y": ["b", "a"]}))
    b = canon(pd.DataFrame({"x": [1, 2], "y": ["a", "b"]}))
    assert a.equals(b)


def test_column_order_insensitive():
    a = canon(pd.DataFrame({"x": [1], "y": [2]}))
    b = canon(pd.DataFrame({"y": [2], "x": [1]}))
    assert list(a.columns) == list(b.columns) == ["x", "y"]
    assert a.equals(b)


def test_none_and_nan_fold_to_the_same_sentinel():
    a = canon(pd.DataFrame({"x": [None]}, dtype=object))
    b = canon(pd.DataFrame({"x": [float("nan")]}))
    assert a.iloc[0, 0] == b.iloc[0, 0] == "<null>"


def test_float_repr_fidelity():
    # repr keeps full round-trip precision — 0.1 + 0.2 must NOT compare
    # equal to 0.3 (the driver hashes exact doubles, so must the gate).
    a = canon(pd.DataFrame({"x": [0.1 + 0.2]}))
    b = canon(pd.DataFrame({"x": [0.3]}))
    assert a.iloc[0, 0] != b.iloc[0, 0]
    assert a.iloc[0, 0] == repr(0.1 + 0.2)


def test_int_like_floats_keep_float_rendering():
    # A DOUBLE column holding 2.0 must not canonicalize like the string
    # '2' from a BIGINT column rendered via str().
    f = canon(pd.DataFrame({"x": [2.0]}))
    i = canon(pd.DataFrame({"x": [2]}))
    assert f.iloc[0, 0] == "2.0" and i.iloc[0, 0] == "2"
