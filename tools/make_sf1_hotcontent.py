"""Synthesize a HOT-CONTENT sf1.0 variant (VERDICT r9 item 6).

The r9 skew fixture stressed hot JOIN/WINDOW keys; the dedup/similarity
family's equivalent adversary is hot CONTENT:

- documents: 2/3 of docs (doc_id % 3 != 0) get one shared BOILERPLATE
  block appended — 17 fresh tokens → 15 trigram shingles each appearing
  in 2/3 of the corpus. Every uncapped inverted-shingle-index join then
  faces posting lists of ~33k docs at sf1.0 (B·(B−1)/2 ≈ 5.6e8 join rows
  PER SHINGLE), and because shared boilerplate pushes pairwise
  Jaccard/containment over low thresholds, the uncapped ANSWER itself
  goes quadratic — the regime the df-capped configs (q233/q234) and the
  banding caps exist for. Boilerplate tokens are disjoint from the
  generator vocabulary so natural shingles are untouched: recall of
  non-hot pairs must be bit-identical to the unmodified corpus.
  n_chars is recomputed (the generator invariant n_chars = LENGTH(text)).

- embeddings: 2/3 of vectors (vec_id % 3 != 0) are replaced by ONE base
  vector plus a tiny deterministic per-(id, dim) perturbation — a
  degenerate near-dup cluster that lands in a single bucket under every
  banding scheme (SRP signs are identical). This is the "2/3 of vectors
  in one LSH bucket" adversary: bucket caps must drop or bound it, and
  pairs among the untouched 1/3 must be unaffected.

All other tables symlink to the source sf1.0 directory.

Usage: python tools/make_sf1_hotcontent.py [src] [out]
       (defaults /tmp/sf1.0 → /tmp/sf1.0-hotcontent)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0-hotcontent"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# 17 tokens disjoint from the testdata vocabulary -> 15 hot trigrams.
BOILERPLATE = " ".join(f"bplate{i:02d}" for i in range(17))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        if os.path.lexists(dst) and os.path.islink(dst):
            os.remove(dst)
        if t == "documents":
            con.sql(
                f"""
                COPY (
                  SELECT doc_id,
                         new_text AS text,
                         lang, source,
                         LENGTH(new_text) AS n_chars
                  FROM (
                    SELECT *, CASE WHEN doc_id % 3 != 0
                                   THEN text || ' ' || '{BOILERPLATE}'
                                   ELSE text END AS new_text
                    FROM read_parquet('{SRC}/{t}.parquet'))
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        elif t == "embeddings":
            con.sql(
                f"""
                COPY (
                  WITH base AS (
                    SELECT embedding AS b
                    FROM read_parquet('{SRC}/{t}.parquet')
                    ORDER BY vec_id LIMIT 1)
                  SELECT vec_id,
                         CASE WHEN vec_id % 3 != 0 THEN
                           list_transform(range(1, len(b) + 1),
                             i -> CAST(b[i] + 1e-4 *
                                  (hash(vec_id * 131 + i) % 97) AS FLOAT))
                         ELSE embedding END AS embedding,
                         label
                  FROM read_parquet('{SRC}/{t}.parquet'), base
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        elif not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{SRC}/{t}.parquet"), dst)

    n, k = con.sql(
        f"SELECT COUNT(*), COUNT(*) FILTER (text LIKE '%bplate00%')"
        f" FROM read_parquet('{OUT}/documents.parquet')"
    ).fetchone()
    print(f"documents: {n} rows, {k} with boilerplate ({100 * k / n:.1f}%)")
    n, k = con.sql(
        f"""
        WITH base AS (SELECT embedding AS b
                      FROM read_parquet('{OUT}/embeddings.parquet')
                      WHERE vec_id % 3 != 0 ORDER BY vec_id LIMIT 1)
        SELECT COUNT(*),
               COUNT(*) FILTER (abs(embedding[1] - b[1]) < 0.02)
        FROM read_parquet('{OUT}/embeddings.parquet'), base
        """
    ).fetchone()
    print(f"embeddings: {n} rows, {k} in the hot cluster ({100 * k / n:.1f}%)")


if __name__ == "__main__":
    main()
