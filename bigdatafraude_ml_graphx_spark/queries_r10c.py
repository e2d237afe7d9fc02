"""Round-10 batch 3: chunk-granular dedup, curation diagnostics, the kNN
graph, and the end-to-end curation pipeline.

- q244: chunk-level exact dedup — fixed 20-token windows hashed and grouped
  across the corpus (paragraph-granularity dedup; q24 is whole-document,
  q240 is variable-length spans).
- q245: per-source exact-duplicate rate — which sources are bringing copies
  (the go/no-go diagnostic for running source-targeted dedup at all).
- q246: kNN graph over embeddings via the production SRP-banded candidates
  with per-node top-k — the input artifact SemDeDup/clustering passes
  consume.
- q247: the curation pipeline END-TO-END — exact dedup → per-source quota →
  per-source token accounting, composing the certified stages into the one
  report a dataset release actually publishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query
from .queries_text import _NORM, _TOKS

_CHUNK = 20
_KNN_K = 5


@query(
    "q244_chunk_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ch AS (SELECT doc_id AS doc,
                  CAST(unnest(range(1, CAST(ceil(len(toks) / {_CHUNK}.0)
                                            AS BIGINT) + 1)) - 1
                       AS BIGINT) AS chunk_idx,
                  unnest(list_transform(
                      range(1, CAST(ceil(len(toks) / {_CHUNK}.0) AS BIGINT) + 1),
                      i -> array_to_string(
                          toks[(i - 1) * {_CHUNK} + 1 : (i - 1) * {_CHUNK} + {_CHUNK}],
                          ' ')))
                    AS chunk_text
           FROM d WHERE len(toks) > 0)
    SELECT md5(chunk_text) AS chunk_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs,
           MIN(doc) AS first_doc
    FROM ch GROUP BY md5(chunk_text) HAVING COUNT(*) >= 2
    """,
)
def q244_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup: documents split into fixed 20-token
    windows (tail partial chunk included), each window md5-hashed and
    grouped corpus-wide — the paragraph-level pass between whole-document
    dedup (q24) and substring-span dedup (q240/q242) that catches copied
    blocks too long for shingle thresholds and too short to dominate a
    doc-level fingerprint.

    Scale shape: the chunking is a pure per-row array slice inside
    whole-stage codegen (NO posexplode-then-regroup round trip — the
    token array is sliced in place and only then exploded), and the group
    key is the 16-byte hash: text never shuffles, the q24 argument at
    chunk granularity."""
    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("doc"), tokens("text").alias("_toks")
    ).filter(F.size("_toks") > 0)
    n_chunks = F.ceil(F.size("_toks") / F.lit(float(_CHUNK))).cast("int")
    chunks = toks.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.concat_ws(
                    " ", F.slice("_toks", (i - 1) * _CHUNK + 1, _CHUNK)
                ),
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    return (
        chunks.select("doc", F.md5("chunk_text").alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.countDistinct("doc").cast("long").alias("n_docs"),
            F.min("doc").alias("first_doc"),
        )
        .filter(F.col("n_copies") >= 2)
    )


@query(
    "q245_source_dup_rate",
    oracle=f"""
    WITH h AS (SELECT source, doc_id, md5({_NORM}) AS fp FROM documents),
    m AS (SELECT source, doc_id,
                 MIN(doc_id) OVER (PARTITION BY fp) AS canon
          FROM h)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id > canon THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dups,
           CAST(SUM(CASE WHEN doc_id > canon THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_rate
    FROM m GROUP BY source
    """,
)
def q245_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate: the fraction of each source's
    documents that are byte-identical (post-normalization) copies of an
    earlier document ANYWHERE in the corpus — the diagnostic that ranks
    sources by how much duplication they import (a crawler re-fetching
    mirrors vs a curated archive). Canonical = min doc_id per fingerprint
    group, the q24 convention, so cross-source copies are charged to the
    later-id source.

    Scale shape: one window over the 16-byte fingerprint (text never
    shuffles) + one per-source aggregate; both map-side-combinable
    shuffles are on keys with no quadratic regime."""
    docs = load_table(spark, sf_dir, "documents")
    from .functions.text import fingerprint

    h = docs.select("source", "doc_id", fingerprint("text").alias("fp"))
    w = Window.partitionBy("fp")
    m = h.withColumn("canon", F.min("doc_id").over(w))
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("doc_id") > F.col("canon")).cast("int"))
            .cast("long")
            .alias("n_dups"),
        )
        .withColumn(
            "dup_rate",
            F.col("n_dups").cast("double") / F.col("n_docs").cast("double"),
        )
    )


def _oracle_knn() -> str:
    from .queries_r10 import _oracle_srp_pairs_capped

    return f"""
    WITH pairs AS ({_oracle_srp_pairs_capped()}),
    sym AS (SELECT a_id AS src, b_id AS dst, cosine_q FROM pairs
            UNION ALL
            SELECT b_id AS src, a_id AS dst, cosine_q FROM pairs)
    SELECT src, dst, cosine_q, rk FROM (
      SELECT src, dst, cosine_q,
             CAST(ROW_NUMBER() OVER (
                 PARTITION BY src ORDER BY cosine_q DESC, dst) AS BIGINT)
               AS rk
      FROM sym)
    WHERE rk <= {_KNN_K}
    """


@query("q246_knn_graph", oracle=_oracle_knn())
def q246_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN graph over the embedding corpus — the artifact
    SemDeDup, graph-based clustering, and link-prediction passes consume:
    q235's production SRP-banded near pairs (corpus-relative bucket cap,
    exact quantized-cosine verification) symmetrized into directed edges,
    then per-node top-k by cosine (ties broken by neighbor id — fully
    deterministic). Nodes whose every near neighbor sits in a capped
    bucket simply have no edges, matching the capped-pairs semantics.

    Scale shape: on top of the already-bounded banded join, the top-k is
    one window whose rank≤k filter compiles to WindowGroupLimit — per-node
    state is O(k) regardless of how many candidates a node accumulates."""
    from .queries_corpus import _SRP32_BANDS, _SRP32_SIGNS, _SRP_TAU
    from .queries_r10 import _DF_FRAC
    from .similarity.srp import srp_banded_pairs

    e = load_table(spark, sf_dir, "embeddings")
    cap = _DF_FRAC * e.count()
    pairs = srp_banded_pairs(
        e, "vec_id", "embedding", _SRP32_SIGNS,
        n_bands=_SRP32_BANDS, min_cosine=_SRP_TAU, bucket_cap=cap,
    )
    # Symmetrize once, off a materialized pair set — the banded join must
    # not run twice for the two edge directions.
    pairs = pairs.localCheckpoint(eager=True)
    sym = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst"), "cosine_q"
    ).unionAll(
        pairs.select(
            F.col("b_id").alias("src"), F.col("a_id").alias("dst"), "cosine_q"
        )
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cosine_q").desc(), F.col("dst").asc()
    )
    return (
        sym.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _KNN_K)
        .select("src", "dst", "cosine_q", "rk")
    )


@query(
    "q247_curation_pipeline",
    oracle=f"""
    WITH h AS (SELECT source, doc_id, n_chars, md5({_NORM}) AS fp,
                      len({_TOKS}) AS n_toks
               FROM documents),
    keep AS (SELECT * FROM (
               SELECT h.*, MIN(doc_id) OVER (PARTITION BY fp) AS canon
               FROM h)
             WHERE doc_id = canon),
    quota AS (SELECT * FROM (
                SELECT keep.*,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id) AS rk
                FROM keep)
              WHERE rk <= 10),
    base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in FROM h
             GROUP BY source),
    afterdedup AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_dedup
                   FROM keep GROUP BY source),
    final AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_final,
                     CAST(SUM(n_toks) AS BIGINT) AS tokens_final
              FROM quota GROUP BY source)
    SELECT base.source, base.docs_in, afterdedup.docs_dedup,
           final.docs_final, final.tokens_final
    FROM base JOIN afterdedup USING (source) JOIN final USING (source)
    """,
)
def q247_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline end-to-end, as ONE declarative plan: exact
    dedup (keep the min-id doc per normalized-text fingerprint) → per-
    source quota (top-10 survivors by n_chars, q239's cap) → the release
    report a dataset card publishes per source: documents in, after
    dedup, after quota, and final token count. Composing the certified
    stages in a single lineage is the point — Catalyst pipelines the
    dedup window, the quota window, and the token count without
    materializing intermediate tables, which is how the 100 TB run avoids
    two extra corpus-sized write/read round trips.

    (Both windows partition on different keys — fp then source — so the
    plan has exactly two exchanges over the slim (source, doc_id,
    n_chars, fp, n_toks) projection; text is scanned once for fp/token
    derivation and never shuffled.)"""
    from .functions.text import fingerprint, token_count

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        "doc_id",
        "n_chars",
        fingerprint("text").alias("fp"),
        token_count("text").cast("long").alias("n_toks"),
    )
    # Feeds the docs_in aggregate AND the dedup window — localCheckpoint
    # per the multi-consumer convention (no CacheManager residue).
    h = h.localCheckpoint(eager=True)
    keep = (
        h.withColumn("canon", F.min("doc_id").over(Window.partitionBy("fp")))
        .filter(F.col("doc_id") == F.col("canon"))
        .drop("canon")
    )
    quota = (
        keep.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("n_chars").desc(), F.col("doc_id").asc()
                )
            ),
        )
        .filter(F.col("rk") <= 10)
    )
    base = h.groupBy("source").agg(F.count("*").cast("long").alias("docs_in"))
    afterdedup = keep.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_dedup")
    )
    final = quota.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_final"),
        F.sum("n_toks").cast("long").alias("tokens_final"),
    )
    return base.join(afterdedup, "source").join(final, "source").select(
        "source", "docs_in", "docs_dedup", "docs_final", "tokens_final"
    )


@query(
    "q248_source_token_tvd",
    oracle=f"""
    WITH tks AS (SELECT source, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS a
           FROM tks GROUP BY 1, 2),
    g AS (SELECT term, CAST(SUM(a) AS BIGINT) AS gct FROM tf GROUP BY term),
    ts AS (SELECT source, CAST(SUM(a) AS BIGINT) AS tsum
           FROM tf GROUP BY source),
    tot AS (SELECT CAST(SUM(gct) AS BIGINT) AS t FROM g),
    j AS (SELECT tf.source,
                 CAST(tf.a AS HUGEINT) AS a, CAST(g.gct AS HUGEINT) AS gct,
                 CAST(ts.tsum AS HUGEINT) AS tsum, CAST(tot.t AS HUGEINT) AS t
          FROM tf JOIN g USING (term) JOIN ts USING (source) CROSS JOIN tot),
    agg AS (SELECT source,
                   ANY_VALUE(tsum) AS tsum, ANY_VALUE(t) AS t,
                   SUM(abs(a * t - gct * tsum)) AS num1,
                   SUM(gct) AS sumg,
                   CAST(COUNT(*) AS BIGINT) AS n_terms
            FROM j GROUP BY source)
    SELECT source, n_terms, CAST(tsum AS BIGINT) AS n_src_tokens,
           CAST(num1 + tsum * (t - sumg) AS DOUBLE)
             / CAST(2 * tsum * t AS DOUBLE) AS tvd
    FROM agg
    """,
)
def q248_source_token_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical divergence: total-variation distance between
    each source's token distribution and the whole-corpus distribution —
    the diversity/contamination diagnostic that flags sources whose
    vocabulary deviates (OCR garbage, spam, wrong-language feeds) before
    they skew a training mixture. TVD rather than the textbook KL because
    the certified cross-engine path is EXACT: with p_s = a/T_s and
    q = g/T, each |p_s − q| term is |a·T − g·T_s| over the common
    denominator T_s·T — pure integer products summed as DECIMAL(38,0)
    (order-independent), and terms absent from the source contribute the
    closed-form missing mass T_s·(T − Σ_{{t∈S}} g) without ever building a
    sources×vocab grid. One double division at the very end, in a pinned
    order; KL's log would put a transcendental inside the sum (the q243
    rule: IEEE division is bit-deterministic, ln is not).

    Scale shape: tf is one (source, term) shuffle; the per-source join
    touches each source's OWN terms only (posting lists per term bounded
    by |sources|), so everything is linear in Σ_s|vocab_s|. At 100 TB
    token counts approach 10¹³ and the integer products reach ~10²⁶
    ≫ 2⁶³, so every product — |a·T − g·T_s|, the missing-mass term
    T_s·(T − Σg), AND the denominator 2·T_s·T — is computed with the
    factors cast to DECIMAL(38,0) first (engine) / HUGEINT (oracle);
    ``tests/test_round11.py`` pins no-wraparound with synthetic ~10¹⁰
    counts whose products exceed 2⁶³ (the q222 overflow-guard model)."""
    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("a"))
    )
    return source_token_tvd_from_tf(tf)


def source_token_tvd_from_tf(tf: DataFrame) -> DataFrame:
    """q248's arithmetic core over a ``(source, term, a)`` count table —
    factored out so the overflow property test can feed synthetic ~10¹⁰
    counts. All integer products run in DECIMAL(38,0): factors are cast
    to decimal(20,0) (lossless for any BIGINT) BEFORE multiplying, so
    products up to ~10³⁸ are exact; the single double rounding happens at
    the final cast, identically in both engines."""
    tf = tf.localCheckpoint(eager=True)  # feeds g, ts, and the final join
    g = tf.groupBy("term").agg(F.sum("a").alias("gct"))
    ts = tf.groupBy("source").agg(F.sum("a").alias("tsum"))
    tot = g.agg(F.sum("gct").alias("t"))
    j = (
        tf.join(g, "term")
        .join(F.broadcast(ts), "source")
        .crossJoin(F.broadcast(tot))
    )
    aD = F.col("a").cast("decimal(20,0)")
    gD = F.col("gct").cast("decimal(20,0)")
    sD = F.col("tsum").cast("decimal(20,0)")
    tD = F.col("t").cast("decimal(20,0)")
    agg = j.groupBy("source").agg(
        F.first("tsum").alias("tsum"),
        F.first("t").alias("t"),
        F.sum(F.abs(aD * tD - gD * sD)).alias("num1"),
        F.sum("gct").alias("sumg"),
        F.count("*").cast("long").alias("n_terms"),
    )
    sD2 = F.col("tsum").cast("decimal(20,0)")
    tD2 = F.col("t").cast("decimal(20,0)")
    gsumD = F.col("sumg").cast("decimal(20,0)")
    return agg.select(
        "source",
        "n_terms",
        F.col("tsum").alias("n_src_tokens"),
        (
            (F.col("num1") + sD2 * (tD2 - gsumD)).cast("double")
            / (F.lit(2).cast("decimal(20,0)") * sD2 * tD2).cast("double")
        ).alias("tvd"),
    )
