"""Round-9 batch: operator-level bag algebra on Spark's built-ins.

q120 certifies MULTISET semantics in the scale-safe one-pass multiplicity
form (1 fact scan + 1 key-sized shuffle); this module keeps a certified
driver row on the built-in ``exceptAll`` / ``intersectAll`` operators
THEMSELVES (SURVEY §2.7's "EXCEPT ALL / INTERSECT ALL" row), exercised
where the built-ins are the right plan: a dim-sized input, where the
extra scans and bag shuffles are noise. The reference's set-op surface is
``distinct``-flavoured (Spark SQL UNION/EXCEPT over small frames); the
bag variants are the §2.14 beyond-reference completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

# ---------------------------------------------------------------------------
# q230 — built-in exceptAll / intersectAll on a dim-sized input
# ---------------------------------------------------------------------------

@query(
    "q230_bag_ops_builtin",
    oracle="""
    WITH a AS (SELECT s_nationkey AS k FROM supplier WHERE s_acctbal >= 2000),
         b AS (SELECT s_nationkey AS k FROM supplier WHERE s_acctbal < 6000),
    ex AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
    ix AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    SELECT op, k, mult FROM (
      SELECT 'except_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS mult
      FROM ex GROUP BY k
      UNION ALL
      SELECT 'intersect_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS mult
      FROM ix GROUP BY k)
    ORDER BY op, k
    """,
)
def q230_bag_ops_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``DataFrame.exceptAll`` / ``intersectAll`` (bag
    EXCEPT ALL / INTERSECT ALL), certified on the operators themselves:
    two overlapping account-balance bands of the supplier dim produce
    multiset bags of nation keys; the result is each bag operator's
    per-key multiplicity, which pins the max(m_a − m_b, 0) / min(m_a,
    m_b) semantics value-by-value (q120 pins only the four global
    statistics). Supplier is dim-sized at every SF (10 k rows/SF), so
    the built-ins' plan — two scans per operator plus a bag shuffle —
    is the right one here; at fact scale the q120 one-pass multiplicity
    rewrite remains the form that survives 100 TB."""
    s = load_table(spark, sf_dir, "supplier")
    a = s.filter(F.col("s_acctbal") >= 2000).select(
        F.col("s_nationkey").alias("k")
    )
    b = s.filter(F.col("s_acctbal") < 6000).select(
        F.col("s_nationkey").alias("k")
    )
    ex = a.exceptAll(b).groupBy("k").agg(F.count("*").alias("mult"))
    ix = a.intersectAll(b).groupBy("k").agg(F.count("*").alias("mult"))
    return (
        ex.select(F.lit("except_all").alias("op"), "k", "mult")
        .unionAll(ix.select(F.lit("intersect_all").alias("op"), "k", "mult"))
        .orderBy("op", "k")
    )


# ---------------------------------------------------------------------------
# q231 — incremental-ingest dedup: probe a new batch against a standing
# MinHash-LSH index (daily crawl-ingestion shape)
# ---------------------------------------------------------------------------

def _probe_oracle(num_hashes: int = 8, bands: int = 4) -> str:
    from .queries_text import _SHINGLES_CTE, _hash_sql

    rows = num_hashes // bands
    mins = ", ".join(
        f"MIN({_hash_sql('shingle', i)}) AS mh_{i:02d}" for i in range(num_hashes)
    )
    band_selects = []
    for band in range(bands):
        cols = [f"mh_{i:02d}" for i in range(band * rows, (band + 1) * rows)]
        key = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc, {band} AS band, md5({key}) AS band_key FROM sig"
        )
    buckets = " UNION ALL ".join(band_selects)
    return f"""
    WITH {_SHINGLES_CTE},
    sig AS (SELECT doc, {mins} FROM sh GROUP BY doc),
    buckets AS ({buckets})
    SELECT p.doc AS doc_probe, i.doc AS doc_index, COUNT(*) AS n_shared_bands
    FROM buckets p
    JOIN buckets i ON p.band = i.band AND p.band_key = i.band_key
    WHERE p.doc % 10 = 0 AND i.doc % 10 != 0
    GROUP BY 1, 2
    """


@query("q231_incremental_ingest_dedup", oracle=_probe_oracle())
def q231_incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion: the docs with ``doc_id % 10 = 0`` play
    a newly crawled batch, the rest the standing corpus; each new doc is
    probed against the corpus's banded MinHash index
    (``dedup.lsh_probe_pairs``) for near-dup candidates. The 100 TB shape
    this certifies: dedup of a daily batch costs batch × collision-rate
    work against a STORED index — never a corpus self-join (q29 covers
    the one-time self-pairing; this covers every ingest after it).
    Signatures are computed once over the full table and checkpointed
    (one scan), then split; in production the index side is a stored
    artifact. Shared hash/banding math with q29's oracle — identical md5
    signature and band-key expressions on both engines."""
    from .dedup.minhash import lsh_probe_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=8).localCheckpoint(eager=True)
    probe = sigs.filter(F.col("doc") % 10 == 0)
    index = sigs.filter(F.col("doc") % 10 != 0)
    return lsh_probe_pairs(index, probe, num_hashes=8, bands=4)


# ---------------------------------------------------------------------------
# q232 — asymmetric containment dedup (subset-duplicate detection)
# ---------------------------------------------------------------------------

def _containment_oracle(threshold: float = 0.5) -> str:
    from .queries_text import _SHINGLES_CTE

    return f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
    shared AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS shared
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
               GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           CAST(s.shared AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS c_a_in_b,
           CAST(s.shared AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS c_b_in_a
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc
    JOIN sizes sb ON s.doc_b = sb.doc
    WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) >= {threshold}
       OR CAST(s.shared AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) >= {threshold}
    """


@query("q232_containment_pairs", oracle=_containment_oracle())
def q232_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups — ``|A∩B|/|A|`` per direction,
    pair kept when either direction ≥ 0.5. Catches subset-duplicates
    symmetric Jaccard (q27) misses: a short doc quoted whole inside a
    longer one has near-1 containment but a union-dominated Jaccard.
    Same inverted-shingle-index join shape as q27 (work ∝ shared
    shingles, never O(N²)); the exact double divisions of the same
    integers make both engines bit-identical."""
    from .dedup.ngram import containment_pairs

    return containment_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.5
    )
