"""Synthesize an sf1.0 dataset from the driver's sf0.1 parquet (10× rows).

The driver only ships sf{0.001,0.01,0.1}; the scale-trade decisions
(two-phase median, distributed percentile, banded dedup caps) were tuned
at sf0.1 and need one measurement OFF that operating point (r7 verdict
item 8b). This generator tiles each table 10× with consistent key shifts
so referential integrity holds (every FK column moves by the same
copy·stride as its parent PK), giving honest join/agg cardinalities at
10× the fact size.

Deliberate shape choices:
  * region/nation stay fixed (real dims don't scale with the fact).
  * events user graph becomes 10 disjoint copies of the sf0.1 graph —
    iterative graph queries then measure 10× the state with the same
    diameter, which is exactly how a partitioned social graph scales.
    Each copy's TIMESTAMPS shift by copy·31 days (the sf0.1 span is one
    month): a 10× event log spans 10× time. Tiling with identical
    timestamps instead makes every (hour, event_type) co-occurrence
    bucket 10× denser → 100× edges — a quadratic GENERATOR artifact that
    benches the wrong thing (found the hard way: q111's edge build
    spilled >30 GB at sf1.0 before the fix).
  * documents get a per-copy suffix token (copy 0 unchanged): 10 exact
    copies of every doc would inflate near-dup candidate PAIRS 45×
    (quadratic in group size) and measure the blowup, not the 10× scan;
    natural cross-copy near-dups remain because the suffix is one token.
  * embeddings are tiled unchanged (vector-space duplicates are a normal
    corpus condition; ANN contracts tolerate distance ties).

Usage: python tools/make_sf1.py [outdir]   (default /tmp/sf1.0)
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
COPIES = 10

# key column -> stride (max key at sf0.1 rounded up; shifts keep copies
# disjoint AND consistent between PK and FK sides). Strides must also
# clear the synthetic-key offsets queries construct from real keys
# (q108 inserts at c_custkey + 1e6, q84 at event_id + 1e7) — a 1e6
# customer stride collided copy 0's synthetic inserts with copy 1's real
# keys and tripped merge_upsert's duplicate-source guard at sf1.0.
STRIDES = {
    "c_custkey": 10_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "o_custkey": 10_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

TABLES = {
    "region": None,  # copied as-is
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for table, keys in TABLES.items():
        src = f"read_parquet('{SRC}/{table}.parquet')"
        dst = f"{OUT}/{table}.parquet"
        if keys is None:
            sql = f"SELECT * FROM {src}"
        else:
            cols = [c[0] for c in con.sql(f"SELECT * FROM {src} LIMIT 0").description]
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + t.i * {STRIDES[c]} AS {c}")
                elif table == "events" and c == "ts":
                    exprs.append(
                        "ts + t.i * INTERVAL 31 DAY AS ts"
                    )
                elif table == "documents" and c == "text":
                    # one-token perturbation, copy 0 byte-identical
                    exprs.append(
                        "CASE WHEN t.i = 0 THEN text "
                        "ELSE text || ' copytag' || CAST(t.i AS VARCHAR) "
                        "END AS text"
                    )
                elif table == "documents" and c == "n_chars":
                    exprs.append(
                        "CASE WHEN t.i = 0 THEN n_chars "
                        "ELSE n_chars + 9 + CASE WHEN t.i >= 10 THEN 1 ELSE 0 END "
                        "END AS n_chars"
                    )
                else:
                    exprs.append(c)
            sql = (
                f"SELECT {', '.join(exprs)} FROM {src}, "
                f"range({COPIES}) AS t(i)"
            )
        con.sql(
            f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, COMPRESSION ZSTD,"
            f" ROW_GROUP_SIZE 262144)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}", flush=True)


if __name__ == "__main__":
    main()
