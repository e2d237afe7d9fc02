"""Training-data quality / packing / scrubbing / contamination queries
(q67-q70) — the corpus-preparation surface beyond the reference's own scope
(its data is tabular; a 100 TB text pipeline needs these before any token is
trained on).

Every query has a full DuckDB oracle; tokenization shares the canonical
normalization fragment with queries_text (single source of truth on both
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .dedup.contamination import contamination_overlap
from .functions.redaction import oracle_hits_sql, oracle_redact_sql, redact_pii, pii_hits
from .functions.repetition import oracle_repetition_sql, repetition_metrics
from .operators.chunking import chunk_documents, oracle_chunk_sql
from .queries import query
from .queries_text import _NORM

_REP_THRESHOLDS = dict(
    max_top_token_frac=0.15, min_distinct_ratio=0.45, max_dup_bigram_frac=0.5
)


@query(
    "q67_repetition_quality",
    oracle=oracle_repetition_sql(norm_sql=_NORM, **_REP_THRESHOLDS),
)
def q67_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition filters: distinct-token ratio, top-token
    share, duplicate-bigram fraction, and the keep/drop verdict per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return repetition_metrics(docs, **_REP_THRESHOLDS)


_CHUNK_TOKENS = 16


@query("q68_doc_chunking", oracle=oracle_chunk_sql(_CHUNK_TOKENS, _NORM))
def q68_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking (training packing): every doc becomes
    ceil(n/16) chunks of ≤16 tokens; pure per-row transform, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=_CHUNK_TOKENS)


_PACK_BUDGET = 64


@query(
    "q83_sequence_packing",
    oracle=f"""
    WITH chunks AS ({oracle_chunk_sql(_CHUNK_TOKENS, _NORM)}),
    lng AS (SELECT doc_id AS doc, lang FROM documents),
    binned AS (
        SELECT l.lang,
               CAST(floor((SUM(c.n_chunk_tokens) OVER (
                               PARTITION BY l.lang ORDER BY c.doc, c.chunk_id
                               ROWS UNBOUNDED PRECEDING)
                           - c.n_chunk_tokens) / {_PACK_BUDGET}.0) AS BIGINT)
                 AS bin_id,
               c.n_chunk_tokens
        FROM chunks c JOIN lng l ON c.doc = l.doc)
    SELECT lang, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_chunk_tokens) AS BIGINT) AS bin_tokens
    FROM binned GROUP BY lang, bin_id
    """,
)
def q83_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-split sequence packing: 16-token chunks laid
    end-to-end per language stream, binned into 64-token training sequences
    (operators/chunking.py::pack_chunks). The group key is the parallelism
    unit — a stand-in for per-shard packing at 100 TB."""
    from .operators.chunking import pack_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=_CHUNK_TOKENS).join(
        docs.select(F.col("doc_id").alias("doc"), "lang"), "doc"
    )
    return pack_chunks(chunks, budget_tokens=_PACK_BUDGET, group_col="lang")


@query(
    "q88_packed_hashed",
    oracle=f"""
    WITH chunks AS ({oracle_chunk_sql(_CHUNK_TOKENS, _NORM)}),
    parted AS (
        SELECT substr(md5(CAST(doc AS VARCHAR)), 1, 1) AS part_id,
               doc, chunk_id, n_chunk_tokens
        FROM chunks),
    binned AS (
        SELECT part_id,
               CAST(floor((SUM(n_chunk_tokens) OVER (
                               PARTITION BY part_id ORDER BY doc, chunk_id
                               ROWS UNBOUNDED PRECEDING)
                           - n_chunk_tokens) / {_PACK_BUDGET}.0) AS BIGINT)
                 AS bin_id,
               n_chunk_tokens
        FROM parted)
    SELECT part_id, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_chunk_tokens) AS BIGINT) AS bin_tokens
    FROM binned GROUP BY part_id, bin_id
    """,
)
def q88_packed_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition sequence packing for corpora WITHOUT a natural group
    key: docs route to 16 virtual partitions by md5-prefix (deterministic
    and engine-portable, unlike ``spark_partition_id()`` which couples the
    output to the physical layout), then pack within each stream
    (operators/chunking.py::pack_chunks_hashed)."""
    from .operators.chunking import pack_chunks_hashed

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=_CHUNK_TOKENS)
    return pack_chunks_hashed(chunks, budget_tokens=_PACK_BUDGET, hex_digits=1)


# The synthetic corpus carries no PII, so the query plants a deterministic
# contact line derived from doc_id on BOTH engines — the redactor then has
# real work whose output the oracle verifies bit-for-bit.
_CONTACT_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example"
    " or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ref ' || CAST(doc_id * doc_id + 100000 AS VARCHAR)"
)


def _contact_col() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ref "),
        (F.col("doc_id") * F.col("doc_id") + 100000).cast("string"),
    )


_HITS = oracle_hits_sql(_CONTACT_SQL)


@query(
    "q69_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           CAST({_HITS['email']} AS BIGINT) AS n_email,
           CAST({_HITS['phone']} AS BIGINT) AS n_phone,
           CAST({_HITS['digits']} AS BIGINT) AS n_digits,
           md5({oracle_redact_sql(_CONTACT_SQL)}) AS redacted_fp
    FROM documents
    """,
)
def q69_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: per-pattern hit counts + fingerprint of the scrubbed text.
    Pure regexp column expressions — whole-stage codegen, no UDF."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_contact", _contact_col()
    )
    hits = pii_hits("_contact")
    return docs.select(
        "doc_id",
        hits["email"].cast("long").alias("n_email"),
        hits["phone"].cast("long").alias("n_phone"),
        hits["digits"].cast("long").alias("n_digits"),
        F.md5(redact_pii("_contact")).alias("redacted_fp"),
    )


def _simhash_pairs_oracle(max_hamming: int = 3) -> str:
    from .queries_text import _simhash_oracle

    bands = max_hamming + 1
    width = 64 // bands
    mask = (1 << width) - 1
    sig = _simhash_oracle().strip()
    return f"""
    WITH sig AS ({sig}),
    banded AS (SELECT doc, simhash, band,
                      (simhash >> (band * {width})) & {mask} AS band_bits
               FROM sig CROSS JOIN (SELECT unnest(range(0, {bands})) AS band)),
    cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                    a.simhash AS sa, b.simhash AS sb
             FROM banded a JOIN banded b
               ON a.band = b.band AND a.band_bits = b.band_bits
              AND a.doc < b.doc)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


@query("q71_simhash_near_pairs", oracle=_simhash_pairs_oracle())
def q71_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: pigeonhole banding (Hamming ≤ 3 ⇒ ≥1 of 4
    bands agree exactly) makes the candidate build an equi join on
    (band, band_bits) — never O(N²); the exact Hamming filter runs on
    candidates only."""
    from .dedup.simhash import simhash_near_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = simhash_near_pairs(docs, max_hamming=3)
    return out.select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def _simhash_groups_oracle(max_hamming: int = 3) -> str:
    """SimHash near-pairs (same fragments as q71) + recursive-CTE transitive
    closure (same labeling as q64): group id = min reachable doc id."""
    pairs = _simhash_pairs_oracle(max_hamming).strip()
    return f"""
    WITH RECURSIVE p AS ({pairs}),
    sym AS (SELECT doc_a AS u, doc_b AS v FROM p
            UNION SELECT doc_b, doc_a FROM p),
    reach(a, bnode) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.bnode = s.u)
    SELECT a AS doc, MIN(bnode) AS dup_group,
           (a = MIN(bnode)) AS is_canonical
    FROM reach GROUP BY a
    """


@query("q76_simhash_dup_groups", oracle=_simhash_groups_oracle())
def q76_simhash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-pairs routed through the SAME connected-components
    canonicalization as the MinHash-LSH pipeline (q64): both fingerprint
    families share one dup-group decision operator. The pair list is a
    distinct-ed equi-join output (one row per pair), so component propagation
    skips its dedup shuffle."""
    from .dedup.simhash import simhash_near_pairs
    from .graph.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_near_pairs(docs, max_hamming=3)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(
        edges,
        vertices=docs.select(F.col("doc_id").alias("id")),
        dedup_edges=False,
    )
    return cc.select(
        F.col("id").alias("doc"),
        F.col("component").alias("dup_group"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


_EVAL_MOD = 50  # every 50th doc stands in for the benchmark set
_MIN_SHARED = 2


@query(
    "q70_contamination_overlap",
    oracle=f"""
    WITH d AS (SELECT doc_id AS doc,
                      list_filter(string_split({_NORM}, ' '), x -> x != '') AS toks
               FROM documents),
    sh AS (SELECT DISTINCT doc, shingle
           FROM (SELECT doc,
                        unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                              i -> array_to_string(toks[i:i+2], ' ')))
                        AS shingle
                 FROM d)),
    ev AS (SELECT doc AS eval_doc, shingle FROM sh WHERE doc % {_EVAL_MOD} = 0),
    evn AS (SELECT eval_doc, COUNT(*) AS eval_n FROM ev GROUP BY eval_doc),
    shared AS (SELECT sh.doc, ev.eval_doc, COUNT(*) AS n_shared
               FROM sh JOIN ev ON sh.shingle = ev.shingle
                              AND sh.doc != ev.eval_doc
               GROUP BY sh.doc, ev.eval_doc
               HAVING COUNT(*) >= {_MIN_SHARED})
    SELECT shared.doc, shared.eval_doc,
           CAST(n_shared AS BIGINT) AS n_shared,
           CAST(n_shared AS DOUBLE) / eval_n AS overlap_frac
    FROM shared JOIN evn USING (eval_doc)
    """,
)
def q70_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination sweep: corpus docs sharing ≥2 word trigrams
    with the (broadcast) eval set, with the fraction of each eval doc's
    shingles found in the training doc."""
    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    return contamination_overlap(
        docs, eval_set, n=3, min_shared=_MIN_SHARED
    ).select(
        "doc",
        "eval_doc",
        F.col("n_shared").cast("long").alias("n_shared"),
        "overlap_frac",
    )
