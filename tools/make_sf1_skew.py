"""Synthesize a HOT-KEY sf1.0 variant (VERDICT r8 item 5).

Takes the tiled sf1.0 dataset (tools/make_sf1.py) and remaps ~2/3 of the
rows of the two fan-in keys the engine's join/graph/window stories lean on
onto ONE key each — the tests/test_skew_stress.py distribution ("one viral
entity": a bot account, a default value) at 10× driver scale:

- lineitem.l_orderkey: 2/3 of rows onto the minimum existing order key
  (stays FK-valid against orders) — stresses the orders⋈lineitem shuffle
  join (AQE skew split) and the groupBy(l_orderkey) aggregates
  (map-side partial aggregation collapses the hot key per mapper).
- events.user_id: 2/3 of rows onto one user — stresses user-partitioned
  windows (sessionization, running aggregates: one window partition
  holds 2/3 of the fact) and per-user graph degree counting.

All other tables are symlinked from the source sf1.0 directory. The skew
bench (BENCH_SF1_SKEW_r09.json) compares per-query wall-clock against the
unskewed sf1.0 artifact: "bounded" means the hot key costs a small
constant factor, not a stage that never finishes.

Usage: python tools/make_sf1_skew.py [src] [out]
       (defaults /tmp/sf1.0 → /tmp/sf1.0-skew)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0-skew"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    hot_ord = con.sql(
        f"SELECT MIN(o_orderkey) FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    hot_usr = con.sql(
        f"SELECT MIN(user_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    print(f"hot l_orderkey={hot_ord} hot user_id={hot_usr}")

    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        if os.path.lexists(dst) and os.path.islink(dst):
            os.remove(dst)
        if t == "lineitem":
            con.sql(
                f"""
                COPY (
                  SELECT * REPLACE (
                    CASE WHEN l_orderkey % 3 != 0 THEN {hot_ord}
                         ELSE l_orderkey END AS l_orderkey)
                  FROM read_parquet('{SRC}/{t}.parquet')
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        elif t == "events":
            con.sql(
                f"""
                COPY (
                  SELECT * REPLACE (
                    CASE WHEN user_id % 3 != 0 THEN {hot_usr}
                         ELSE user_id END AS user_id)
                  FROM read_parquet('{SRC}/{t}.parquet')
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        elif not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{SRC}/{t}.parquet"), dst)
    for t in ("lineitem", "events"):
        n, k = con.sql(
            f"SELECT COUNT(*), COUNT(*) FILTER ("
            f"{'l_orderkey = ' + str(hot_ord) if t == 'lineitem' else 'user_id = ' + str(hot_usr)})"
            f" FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows, {k} on the hot key ({100 * k / n:.1f}%)")


if __name__ == "__main__":
    main()
