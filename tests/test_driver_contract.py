"""CI smoke for the driver contract (__spark_entry__.py).

The real gate is tools/driver_sim.py (a fresh process with a plain
session, the way the driver runs it); this test keeps the contract's
SHAPE from regressing inside the normal pytest loop: the three entry
points exist, entry() produces rows with the flagship schema, every
oracle has a query, and the only queries without oracles are the two
documented rows-only entries (engine-specific ML/IVF internals, each
wrapped by an exact contract query: q140/q172/q185)."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as E

# q49 graduated to an exact DuckDB oracle in r11 (engine-portable centroid
# sample + quantized-arithmetic mirror); q32's GBT output is genuinely
# library-version-dependent and stays the one rows-only query.
ROWS_ONLY = {"q32_gbt_confusion"}


def test_entry_runs_flagship(spark):
    df = E.entry(spark)
    names = [f.name for f in df.schema.fields]
    assert names[:2] == ["l_returnflag", "l_linestatus"]
    assert len(df.collect()) > 0


def test_queries_and_oracles_pair_up():
    q, o = E.queries(), E.oracle_sql()
    assert set(q) - set(o) == ROWS_ONLY
    assert not set(o) - set(q), "oracle without a query"
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())
