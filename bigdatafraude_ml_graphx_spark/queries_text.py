"""Text-analysis / dedup / similarity query declarations (north-star ops,
BASELINE.json) over the ``documents`` and ``embeddings`` tables.

Every oracle mirrors the engine's exact arithmetic: md5-based portable hashes,
the canonical tokenization, and quantized-int64 accumulation for float sums
(see ``graph/pagerank.py`` for why decimal casts are avoided).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .dedup import (
    duplicate_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from .functions.text import (
    STOPWORDS,
    fingerprint,
    lang_guess,
    punct_ratio,
    quality_score,
    token_count,
)
from .queries import query
from .similarity import cosine_topk

# --- shared DuckDB SQL fragments mirroring functions/text.py exactly ---

_NORM = (
    "regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')"
)
_TOKS = f"list_filter(string_split({_NORM}, ' '), x -> x != '')"

# Word trigram shingles per doc (distinct), as a CTE over `documents`.
_SHINGLES_CTE = f"""
    d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id AS doc, shingle
           FROM (SELECT doc_id,
                        unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                              i -> array_to_string(toks[i:i+2], ' ')))
                        AS shingle
                 FROM d))
"""


def _hash_sql(expr: str, salt: int) -> str:
    """DuckDB mirror of dedup.minhash._hash64."""
    return f"CAST('0x' || substr(md5('{salt}:' || {expr}), 1, 15) AS BIGINT)"


@query(
    "q24_dedup_exact",
    oracle=f"""
    SELECT md5({_NORM}) AS fp,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY fp
    """,
)
def q24_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups via content fingerprint hash-groupBy — only the
    16-byte md5 ever shuffles, not the text."""
    return duplicate_groups(load_table(spark, sf_dir, "documents"))


@query(
    "q25_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             / length(text) AS punct_ratio,
           md5({_NORM}) AS fp
    FROM documents
    """,
)
def q25_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + punctuation ratio + fingerprint — pure column
    expressions, no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        punct_ratio("text").alias("punct_ratio"),
        fingerprint("text").alias("fp"),
    )


def _lang_quality_oracle() -> str:
    hit_exprs = {
        lang: (
            f"len(list_filter({_TOKS}, x -> x IN "
            f"({', '.join(repr(w) for w in STOPWORDS[lang])})))"
        )
        for lang in sorted(STOPWORDS)
    }
    hits_cols = ", ".join(f"{e} AS {lang}_h" for lang, e in hit_exprs.items())
    langs = sorted(STOPWORDS)
    gmax = f"greatest({', '.join(f'{la}_h' for la in langs)})"
    when = " ".join(f"WHEN {la}_h = {gmax} THEN '{la}'" for la in langs)
    sw_total = " + ".join(f"{la}_h" for la in langs)
    return f"""
    WITH h AS (SELECT doc_id, lang, text, {hits_cols} FROM documents)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN {gmax} = 0 THEN 'unknown' {when} END AS guessed_lang,
           0.4 * least(CAST(len({_TOKS}) AS DOUBLE) / 50.0, 1.0)
           + 0.3 * (1.0 - least(4.0 * (CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                                        / length(text)), 1.0))
           + 0.3 * least(CAST({sw_total} AS DOUBLE) / 5.0, 1.0) AS quality
    FROM h
    """


@query("q26_lang_quality", oracle=_lang_quality_oracle())
def q26_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit argmax) + composite quality
    score — the filter stage of a training-data pipeline."""
    from .functions.text import lang_guess_from_tokens, quality_score_from_tokens, tokens

    d = load_table(spark, sf_dir, "documents")
    staged = d.select("doc_id", "lang", "text", tokens("text").alias("_toks"))
    return staged.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_guess_from_tokens(F.col("_toks")).alias("guessed_lang"),
        quality_score_from_tokens(F.col("text"), F.col("_toks")).alias("quality"),
    )


@query(
    "q27_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
    shared AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS shared
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
               GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           CAST(s.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE)
             AS jaccard
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc
    JOIN sizes sb ON s.doc_b = sb.doc
    WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE)
          >= 0.04
    """,
)
def q27_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup pairs via inverted shingle index —
    the O(shared-shingle) join, never the O(N²) cross product."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.04
    )


_K_MINHASH = 8


def _minhash_oracle() -> str:
    mins = ",\n           ".join(
        f"MIN({_hash_sql('shingle', i)}) AS mh_{i:02d}" for i in range(_K_MINHASH)
    )
    return f"WITH {_SHINGLES_CTE} SELECT doc, {mins} FROM sh GROUP BY doc"


@query("q28_minhash_signatures", oracle=_minhash_oracle())
def q28_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8, md5-based portable hashes); the shuffle
    carries k longs per doc thanks to map-side partial MIN."""
    return minhash_signatures(
        load_table(spark, sf_dir, "documents"), num_hashes=_K_MINHASH
    )


def _lsh_oracle(bands: int = 4) -> str:
    rows = _K_MINHASH // bands
    band_selects = []
    for band in range(bands):
        cols = [f"mh_{i:02d}" for i in range(band * rows, (band + 1) * rows)]
        key = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc, {band} AS band, md5({key}) AS band_key FROM sig"
        )
    buckets = " UNION ALL ".join(band_selects)
    mins = ", ".join(
        f"MIN({_hash_sql('shingle', i)}) AS mh_{i:02d}" for i in range(_K_MINHASH)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sig AS (SELECT doc, {mins} FROM sh GROUP BY doc),
    buckets AS ({buckets})
    SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_shared_bands
    FROM buckets a
    JOIN buckets b ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc
    GROUP BY 1, 2
    """


@query("q29_lsh_candidates", oracle=_lsh_oracle())
def q29_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate pairs — the equi-join-on-bucket scale
    path for near-dedup."""
    sigs = minhash_signatures(
        load_table(spark, sf_dir, "documents"), num_hashes=_K_MINHASH
    )
    return lsh_candidate_pairs(sigs, num_hashes=_K_MINHASH, bands=4)


def _simhash_oracle() -> str:
    """64-bit SimHash mirror: hex chars 1-8 / 9-16 of one md5 per token are
    the two 32-bit halves (matching dedup/simhash.py). DuckDB's checked
    arithmetic rejects ``1 << 63``, so the sign bit is set via xor with
    MIN_BIGINT instead."""
    md5 = "md5('0:' || tok)"
    h_lo = f"CAST('0x' || substr({md5}, 1, 8) AS BIGINT)"
    h_hi = f"CAST('0x' || substr({md5}, 9, 8) AS BIGINT)"

    def bit(b: int) -> str:
        col, off = ("h_lo", b) if b < 32 else ("h_hi", b - 32)
        return f"({col} >> {off}) & 1"

    bit_sums = ", ".join(
        f"CAST(SUM({bit(b)}) AS BIGINT) AS b{b}" for b in range(64)
    )
    low = " | ".join(
        f"CASE WHEN b{b} * 2 > n_toks THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END"
        for b in range(63)
    )
    return f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tk AS (SELECT doc_id AS doc, unnest(toks) AS tok FROM d),
    hashed AS (SELECT doc, {h_lo} AS h_lo, {h_hi} AS h_hi FROM tk),
    bits AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_toks, {bit_sums}
             FROM hashed GROUP BY doc),
    lo AS (SELECT doc, ({low}) AS lo_bits, b63, n_toks FROM bits)
    SELECT doc,
           CASE WHEN b63 * 2 > n_toks
                THEN xor(lo_bits, CAST('-9223372036854775808' AS BIGINT))
                ELSE lo_bits END AS simhash
    FROM lo
    """


@query("q30_simhash", oracle=_simhash_oracle())
def q30_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (majority-vote bits over two salted md5
    token-hash halves) — exploded-bit aggregation, no UDFs."""
    return simhash64(load_table(spark, sf_dir, "documents"))


def _cosine_oracle(k: int = 5, dim: int = 64) -> str:
    def qdot(va: str, vb: str) -> str:
        prods = (
            f"[CAST(floor(CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE) * 1e12 + 0.5)"
            f" AS BIGINT) for i in range(1, {dim + 1})]"
        )
        return f"(CAST(CAST(list_sum({prods}) AS BIGINT) AS DOUBLE) / 1e12)"

    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             {qdot('qv', 'cv')} / (sqrt({qdot('cv', 'cv')}) * sqrt({qdot('qv', 'qv')}))
               AS cosine
      FROM q JOIN c ON neighbor_id != query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("q31_cosine_topk", oracle=_cosine_oracle())
def q31_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search: query vectors broadcast
    against the corpus, quantized-int64 dot products, ranking window."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _dedup_groups_oracle(bands: int = 4) -> str:
    """LSH candidate pairs (same fragments as q29) + recursive-CTE transitive
    closure (same labeling as q22): group id = min reachable doc id."""
    rows = _K_MINHASH // bands
    band_selects = []
    for band in range(bands):
        cols = [f"mh_{i:02d}" for i in range(band * rows, (band + 1) * rows)]
        key = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc, {band} AS band, md5({key}) AS band_key FROM sig"
        )
    buckets = " UNION ALL ".join(band_selects)
    mins = ", ".join(
        f"MIN({_hash_sql('shingle', i)}) AS mh_{i:02d}" for i in range(_K_MINHASH)
    )
    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sig AS (SELECT doc, {mins} FROM sh GROUP BY doc),
    buckets AS ({buckets}),
    pairs AS (
        SELECT a.doc AS src, b.doc AS dst
        FROM buckets a
        JOIN buckets b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc < b.doc
        GROUP BY 1, 2),
    sym AS (SELECT src AS u, dst AS v FROM pairs UNION SELECT dst, src FROM pairs),
    reach(a, bnode) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.bnode = s.u)
    SELECT a AS doc, MIN(bnode) AS dup_group,
           (a = MIN(bnode)) AS is_canonical
    FROM reach GROUP BY a
    """


@query(
    "q73_tfidf_keywords",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM d)
           GROUP BY doc_id, term),
    dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
               CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                 / CAST(dfx.df AS DOUBLE) AS score
        FROM tf JOIN dfx ON tf.term = dfx.term CROSS JOIN n),
    ranked AS (
        SELECT doc_id, term, tf, df, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term ASC) AS term_rank
        FROM scored)
    SELECT doc_id, term, tf, df, score, CAST(term_rank AS INTEGER) AS term_rank
    FROM ranked WHERE term_rank <= 3
    """,
)
def q73_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (rarity-ratio idf, frozen
    deterministic contract — see functions/tfidf.py). Only (doc_id, term)
    pairs shuffle; the text never does."""
    from .functions.tfidf import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


@query("q64_near_dup_groups", oracle=_dedup_groups_oracle())
def q64_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup pipeline: MinHash signatures → banded LSH
    candidate pairs → connected components over the candidate graph →
    one dup_group per document (min doc id in its group; docs that pair with
    nothing are their own singleton groups) + a canonical-keeper flag.

    This is THE training-data dedup shape at 100 TB: the only shuffles are
    the signature aggregation (|docs|·k longs), the band-bucket equi-join
    (never O(N²) — AQE splits hot buckets), and O(cluster-diameter) rounds of
    min-label propagation over the (tiny) candidate graph. The candidate
    edge list is a groupBy output — already one row per pair — so component
    propagation skips its dedup shuffle.
    """
    from .graph.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=_K_MINHASH)
    pairs = lsh_candidate_pairs(sigs, num_hashes=_K_MINHASH, bands=4)
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


def _canonical_dedup_oracle() -> str:
    """q64's group closure + per-group quality argmax (longest doc wins,
    doc id breaks ties) — built from the same fragments so the two
    queries certify one pipeline."""
    base = _dedup_groups_oracle()
    core = base[: base.rindex("SELECT a AS doc")]  # keep the CTE chain
    return f"""{core}
    -- (continuing the CTE chain; `core` ends after the reach() definition)
    , groups AS (SELECT a AS doc, MIN(bnode) AS dup_group FROM reach GROUP BY a),
    ranked AS (
      SELECT g.dup_group, g.doc, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY g.dup_group
                                ORDER BY d.n_chars DESC, g.doc DESC) AS rn,
             COUNT(*) OVER (PARTITION BY g.dup_group) AS n_docs
      FROM groups g JOIN documents d ON d.doc_id = g.doc)
    SELECT dup_group, doc AS kept_doc, n_chars AS kept_chars,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs - 1 AS BIGINT) AS n_removed
    FROM ranked WHERE rn = 1
    """


@query("q141_canonical_dedup", oracle=_canonical_dedup_oracle())
def q141_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-priority dedup policy: q64's near-dup groups, but the kept
    document is the LONGEST in its group (doc id breaks ties) instead of
    the smallest id — the policy real corpus dedup uses ('keep the best
    copy'), composed from the same MinHash→LSH→CC pipeline plus one
    per-group argmax window (bounded by group size, parallel across
    groups). Returns one row per group with the keep decision and removal
    count — the dedup audit a data card reports."""
    from .graph.components import connected_components
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=_K_MINHASH)
    pairs = lsh_candidate_pairs(sigs, num_hashes=_K_MINHASH, bands=4)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(
        edges,
        vertices=docs.select(F.col("doc_id").alias("id")),
        dedup_edges=False,
    )
    g = cc.select(F.col("id").alias("doc"), F.col("component").alias("dup_group")).join(
        docs.select(F.col("doc_id").alias("doc"), "n_chars"), "doc"
    )
    w = Window.partitionBy("dup_group").orderBy(
        F.col("n_chars").desc(), F.col("doc").desc()
    )
    return (
        g.withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count("*").over(Window.partitionBy("dup_group")))
        .filter(F.col("rn") == 1)
        .select(
            "dup_group",
            F.col("doc").alias("kept_doc"),
            F.col("n_chars").alias("kept_chars"),
            F.col("n_docs"),
            (F.col("n_docs") - 1).alias("n_removed"),
        )
    )


_MHJ_BOUND = 0.30  # empirical max |est − exact| at sf0.01 is 0.235 (k=8)
_MHJ_DF_CAP = 100_000  # shingle document-frequency cap (inert at test scale)


def _minhash_estimate_oracle() -> str:
    """Candidate pairs (q29 fragments) + MinHash agreement estimate +
    exact shingle Jaccard + the error-bound boolean, all in one query.

    The verification side computes Jaccard over the DF-CAPPED shingle
    universe (document frequency ≤ {_MHJ_DF_CAP}) — the cap is part of the
    query's semantics and is mirrored here (``shc``), not an engine-only
    heuristic the oracle silently ignores (ADVICE r5 item 2). At
    certification scale no shingle approaches the cap, so the capped and
    uncapped answers coincide; at 100 TB the cap is what keeps a
    boilerplate shingle from going quadratic."""
    mins = ", ".join(
        f"MIN({_hash_sql('shingle', i)}) AS mh_{i:02d}"
        for i in range(_K_MINHASH)
    )
    band_sel = []
    rows = _K_MINHASH // 4
    for b in range(4):
        cols = [f"mh_{i:02d}" for i in range(b * rows, (b + 1) * rows)]
        key = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_sel.append(f"SELECT doc, {b} AS band, md5({key}) AS bk FROM sig")
    agree = " + ".join(
        f"CASE WHEN sa.mh_{i:02d} = sb.mh_{i:02d} THEN 1 ELSE 0 END"
        for i in range(_K_MINHASH)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sig AS (SELECT doc, {mins} FROM sh GROUP BY doc),
    buckets AS ({' UNION ALL '.join(band_sel)}),
    pairs AS (SELECT a.doc AS doc_a, b.doc AS doc_b
              FROM buckets a JOIN buckets b
                ON a.band = b.band AND a.bk = b.bk AND a.doc < b.doc
              GROUP BY 1, 2),
    agree AS (
      SELECT p.doc_a, p.doc_b, CAST({agree} AS BIGINT) AS n_agree
      FROM pairs p JOIN sig sa ON sa.doc = p.doc_a
                   JOIN sig sb ON sb.doc = p.doc_b),
    shc AS (SELECT sh.doc, sh.shingle FROM sh
            JOIN (SELECT shingle FROM sh GROUP BY shingle
                  HAVING COUNT(*) <= {_MHJ_DF_CAP}) ok USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM shc GROUP BY doc),
    shared AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS sh
               FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
               GROUP BY 1, 2)
    SELECT g.doc_a, g.doc_b, g.n_agree,
           CAST(g.n_agree AS DOUBLE) / {_K_MINHASH} AS jaccard_est,
           CAST(COALESCE(s.sh, 0) AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - COALESCE(s.sh, 0) AS DOUBLE)
             AS jaccard_exact,
           (ABS(CAST(g.n_agree AS DOUBLE) / {_K_MINHASH}
                - CAST(COALESCE(s.sh, 0) AS DOUBLE)
                  / CAST(sa.n_sh + sb.n_sh - COALESCE(s.sh, 0) AS DOUBLE))
            <= {_MHJ_BOUND}) AS within_bound
    FROM agree g
    LEFT JOIN shared s ON s.doc_a = g.doc_a AND s.doc_b = g.doc_b
    JOIN sizes sa ON sa.doc = g.doc_a
    JOIN sizes sb ON sb.doc = g.doc_b
    """


@query("q151_minhash_error_contract", oracle=_minhash_estimate_oracle())
def q151_minhash_error_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard ESTIMATES with an in-query verified error contract
    (the q81 sketch discipline applied to the dedup stack): for every LSH
    candidate pair, the signature-agreement estimate (n_agree/k — the
    production similarity score that never touches shingle sets) sits
    beside the exact shingle Jaccard and a pinned |est − exact| ≤ 0.30
    boolean (empirical max 0.235 at k=8). The exact-Jaccard verification
    join is the TEST path — production consumes the estimate alone — and
    it is BOUNDED two ways (VERDICT r5 item 1): the shingle set is
    semi-joined down to the candidate docs BEFORE the self-join (exact —
    pairs outside the candidates are discarded by the left-outer anyway),
    and shingles above the ``_MHJ_DF_CAP`` document-frequency cap are
    dropped on both engine and oracle sides (``drop_hot_buckets`` /
    the ``shc`` CTE), so a boilerplate shingle shared by B docs can never
    emit B·(B−1)/2 rows. All arithmetic: integer agreement counts, one
    IEEE division per ratio."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=_K_MINHASH).localCheckpoint(
        eager=True
    )
    pairs = lsh_candidate_pairs(sigs, num_hashes=_K_MINHASH, bands=4).select(
        "doc_a", "doc_b"
    )
    agree_expr = sum(
        F.when(F.col(f"a.mh_{i:02d}") == F.col(f"b.mh_{i:02d}"), 1).otherwise(0)
        for i in range(_K_MINHASH)
    )
    agree = (
        pairs.join(sigs.alias("a"), F.col("doc_a") == F.col("a.doc"))
        .join(sigs.alias("b"), F.col("doc_b") == F.col("b.doc"))
        .select("doc_a", "doc_b", agree_expr.cast("long").alias("n_agree"))
    )
    from .dedup.ngram import _doc_shingles, candidate_pair_shingle_stats

    # Key-partition the shingle stream before the stats builder (r13): the
    # map-side array_distinct removed the old global-distinct Exchange, so
    # without this the builder's eager checkpoint inherits the scan's ONE
    # partition and every downstream join runs serial (measured +12 s at
    # sf0.1); the repartition also shares the tokenize map side between the
    # builder's df-cap aggregate and its join inputs.
    sh = _doc_shingles(docs, "text", "doc_id", 3, distinct=True).repartition(
        F.col("shingle")
    )
    stats = candidate_pair_shingle_stats(sh, pairs, max_df=_MHJ_DF_CAP)
    est = F.col("n_agree").cast("double") / _K_MINHASH
    exact = F.col("sh_n").cast("double") / (
        F.col("na") + F.col("nb") - F.col("sh_n")
    ).cast("double")
    return (
        agree.join(stats, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            est.alias("jaccard_est"),
            exact.alias("jaccard_exact"),
            (F.abs(est - exact) <= _MHJ_BOUND).alias("within_bound"),
        )
    )
