"""Driver-gate simulation: smoke entry(), then run EVERY queries() entry
against its oracle_sql() in DuckDB at sf0.01 — plain SparkSession (the
driver owns the session; none of the engine's configs), row count + sorted
column names + order-insensitive value compare, the same contract as the
real correctness gate. Usage: python tools/driver_sim.py
(see .claude/skills/verify/SKILL.md). Optional argv: query names to
restrict the run (targeted re-verify after an edit)."""
import math
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

spark = SparkSession.builder.master("local[8]").getOrCreate()

import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        try:
            if pd.isna(v):
                return "<null>"
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


queries = E.queries()
oracles = E.oracle_sql()
only = set(sys.argv[1:])
if only:
    missing = only - set(queries)
    assert not missing, f"unknown query names: {sorted(missing)}"
    queries = {k: v for k, v in queries.items() if k in only}
npass = nfail = nweak = 0
for name, fn in queries.items():
    t0 = time.time()
    try:
        actual = fn(spark, SF).toPandas()
        if name not in oracles:
            nweak += 1
            print(f"WEAK {name}: rows-only, {len(actual)} rows  [{time.time()-t0:.1f}s]")
            continue
        expected = con.execute(oracles[name]).df()
        assert len(actual) == len(expected), f"rows {len(actual)} != {len(expected)}"
        assert sorted(actual.columns) == sorted(expected.columns), (
            f"cols {sorted(actual.columns)} != {sorted(expected.columns)}")
        a, e = canon(actual), canon(expected)
        assert a.equals(e), "value mismatch"
        npass += 1
        print(f"PASS {name} ({len(actual)} rows)  [{time.time()-t0:.1f}s]")
    except Exception as ex:
        nfail += 1
        print(f"FAIL {name}: {str(ex)[:300]}  [{time.time()-t0:.1f}s]")

print(f"RESULT: {npass} pass, {nfail} fail, {nweak} rows-only")
