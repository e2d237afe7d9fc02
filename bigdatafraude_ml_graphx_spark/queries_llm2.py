"""Round-5 LLM-data-pipeline extensions: edit-distance fuzzy dedup,
integer-exact stopword quality, bigram PMI (collocation mining),
deterministic hash-based train/val/test splitting, and Kneser-Ney
continuation counts (LM smoothing prep).

All five are exact-oracle queries over `documents`. Float discipline:
ratios are emitted as ONE division over exact integer aggregates (both
engines correctly round a single IEEE op identically); `ln` is the only
non-correctly-rounded function used and is rounded to the 6-dp grid on
both sides (the q106 token-entropy contract).

The reference has no text surface (SURVEY §2.8); these extend the
north-star training-pipeline set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.skew import drop_hot_buckets
from .queries import query

# ---------------------------------------------------------------------------
# q132 — fuzzy near-duplicate prefixes (blocked Levenshtein)
# ---------------------------------------------------------------------------

_FZ_PRE = 24
_FZ_MAXLEV = 10


@query(
    "q132_fuzzy_prefix_pairs",
    oracle=f"""
    WITH p0 AS (
      SELECT doc_id, lang,
             string_split(text, ' ')[1] AS w1,
             substring(text, 1, {_FZ_PRE}) AS pre
      FROM documents),
    -- block cap mirrored from the engine's drop_hot_buckets (ADVICE r5
    -- item 2): a block key held by more than the cap is dropped on BOTH
    -- sides, so the oracle states the query's actual semantics
    p AS (
      SELECT p0.* FROM p0
      JOIN (SELECT lang, w1 FROM p0 GROUP BY lang, w1
            HAVING COUNT(*) <= {100_000}) ok USING (lang, w1))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.pre, b.pre) AS INT) AS lev
    FROM p a JOIN p b
      ON a.lang = b.lang AND a.w1 = b.w1 AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pre, b.pre) <= {_FZ_MAXLEV}
    """,
)
def q132_fuzzy_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy dedup: document pairs whose {24}-char prefixes
    are within Levenshtein {10}, candidates blocked on (lang, first
    token) — the classic blocked-edit-distance sweep (titles, URLs,
    boilerplate headers). Levenshtein is O(m·n) per pair, so the block
    join is the whole game at 100 TB: candidates come from an equi join
    on the block key, hot blocks are capped by ``drop_hot_buckets`` (the
    LSH-family guard — inert at this scale, bounds a degenerate common
    first token), and only the 24-char prefixes travel through the join,
    never full documents."""
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        "lang",
        F.split(F.col("text"), " ").getItem(0).alias("w1"),
        F.substring("text", 1, _FZ_PRE).alias("pre"),
    )
    # Materialize the (tiny) projection once: the cap's count pass and
    # both join sides would otherwise each re-scan documents (the
    # eager/non-recoverable contract of the dedup pair builders).
    p = p.localCheckpoint(eager=True)
    p = drop_hot_buckets(p, ["lang", "w1"], 100_000)
    # Candidate-volume discipline (r8 sf1.0 sweep: 57× at 10× data on a
    # duplicate-heavy corpus before this — 11M candidate pairs from 150
    # coarse (lang, first-token) blocks): the DP and the join both run on
    # DISTINCT prefixes, not documents. Exact duplicates — precisely what
    # a dup-heavy corpus piles into each block — collapse to one group
    # row before the self-join (a 10-copy group contributes 1 candidate
    # row, not 10), the surviving prefix pairs run the BANDED Levenshtein
    # (threshold arg, O(k·m), −1 past the bound), and doc pairs expand
    # back afterwards: within-group pairs at distance 0, cross-group
    # pairs at the group distance. Output is identical to the per-doc
    # join — the expansion is the true answer's size, which no algorithm
    # avoids — but the quadratic join/DP work scales with distinct
    # prefixes, not copies.
    g = p.groupBy("lang", "w1", "pre").agg(F.collect_list("doc_id").alias("ids"))
    ga = g.select(
        "lang", "w1", F.col("pre").alias("pa"), F.col("ids").alias("ids_a")
    )
    gb = g.select(
        "lang", "w1", F.col("pre").alias("pb"), F.col("ids").alias("ids_b")
    )
    lev = F.when(F.col("pa") == F.col("pb"), F.lit(0)).otherwise(
        F.levenshtein("pa", "pb", _FZ_MAXLEV)
    )
    kept = (
        ga.join(gb, ["lang", "w1"])
        .filter(F.col("pa") <= F.col("pb"))
        .withColumn("lev", lev)
        .filter((F.col("lev") >= 0) & (F.col("lev") <= _FZ_MAXLEV))
    )
    # Expansion: same-group explode² emits each unordered pair twice —
    # keep doc_a < doc_b; distinct-group pairs appear once — orient with
    # least/greatest.
    return (
        kept.select(
            "pa", "pb", "lev", F.explode("ids_a").alias("da"), "ids_b"
        )
        .select("pa", "pb", "lev", "da", F.explode("ids_b").alias("db"))
        .filter(
            ((F.col("pa") != F.col("pb")) & (F.col("da") != F.col("db")))
            | (F.col("da") < F.col("db"))
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "lev",
        )
    )


# ---------------------------------------------------------------------------
# q133 — stopword-ratio quality buckets (integer-exact)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a")


@query(
    "q133_stopword_quality",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 w -> w IN ('the', 'a'))) AS n_stop
      FROM documents),
    b AS (
      SELECT lang, n_tokens, n_stop,
             CASE WHEN 20 * n_stop < n_tokens THEN 'low'
                  WHEN 20 * n_stop < 3 * n_tokens THEN 'mid'
                  ELSE 'high' END AS stop_bucket
      FROM t)
    SELECT lang, stop_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_stop) AS BIGINT) AS sum_stop,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_stop) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
             AS stop_ratio
    FROM b
    GROUP BY lang, stop_bucket
    ORDER BY lang, stop_bucket
    """,
)
def q133_stopword_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio quality screen: per (lang, bucket) document counts
    with the pooled stopword ratio. Bucket thresholds (5% / 15%) compare
    INTEGERS (20·n_stop < n_tokens ⇔ ratio < 0.05) — no per-doc float
    ever exists, and the group ratio is one division over exact integer
    sums, so the whole query is bit-reproducible. One corpus scan, one
    small shuffle on (lang, bucket)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    t = d.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).alias(
            "n_stop"
        ),
    )
    bucket = (
        F.when(20 * F.col("n_stop") < F.col("n_tokens"), "low")
        .when(20 * F.col("n_stop") < 3 * F.col("n_tokens"), "mid")
        .otherwise("high")
    )
    return (
        t.withColumn("stop_bucket", bucket)
        .groupBy("lang", "stop_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_stop").alias("sum_stop"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .withColumn(
            "stop_ratio",
            F.col("sum_stop").cast("double")
            / F.col("sum_tokens").cast("double"),
        )
        .orderBy("lang", "stop_bucket")
    )


# ---------------------------------------------------------------------------
# q134 — bigram PMI (collocation mining)
# ---------------------------------------------------------------------------

_PMI_TOPN = 40
_PMI_MIN_C = 20


def _oracle_pmi() -> str:
    return f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS tk FROM documents),
    uni AS (
      SELECT w, COUNT(*) AS c_w
      FROM (SELECT UNNEST(tk) AS w FROM toks)
      GROUP BY w),
    bi AS (
      SELECT w1, w2, COUNT(*) AS c_ab
      FROM (
        SELECT tk[i] AS w1, tk[i + 1] AS w2
        FROM toks, UNNEST(range(1, len(tk))) AS u(i))
      GROUP BY w1, w2),
    tot AS (
      SELECT (SELECT SUM(c_w) FROM uni) AS n_uni,
             (SELECT SUM(c_ab) FROM bi) AS n_bi)
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
           ROUND(LN((CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE)
                     * CAST(n_uni AS DOUBLE))
                    / (CAST(n_bi AS DOUBLE) * CAST(c1.c_w AS DOUBLE)
                       * CAST(c2.c_w AS DOUBLE))), 6) AS pmi
    FROM bi, tot
    JOIN uni c1 ON c1.w = w1
    JOIN uni c2 ON c2.w = w2
    WHERE c_ab >= {_PMI_MIN_C}
    ORDER BY pmi DESC, w1, w2
    LIMIT {_PMI_TOPN}
    """


@query("q134_bigram_pmi", oracle=_oracle_pmi())
def q134_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of corpus bigrams — the standard
    collocation/multi-word-expression miner (and the BPE-merge scoring
    numerator). Unigram and bigram counts aggregate in two map-side
    combined passes over the staged token arrays; the count frames join
    by word with size-guarded semantics (unigram table is vocabulary-
    sized); PMI's float expression is parenthesized IDENTICALLY in both
    engines (each IEEE op correctly rounded) and `ln` lands on the 6-dp
    grid. Min-count {20} kills the low-count PMI noise the measure is
    infamous for; top-k ties break on the bigram itself."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("tk"))
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_w"))
    )
    gram_idx = F.when(
        F.size("tk") >= 2, F.sequence(F.lit(1), F.size("tk") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = (
        toks.select(
            F.explode(
                F.transform(
                    gram_idx,
                    lambda i: F.struct(
                        F.element_at(F.col("tk"), i).alias("w1"),
                        F.element_at(F.col("tk"), i + 1).alias("w2"),
                    ),
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_C)
    )
    totals = uni.agg(F.sum("c_w").alias("n_uni")).crossJoin(
        toks.select(
            F.greatest(F.size("tk") - 1, F.lit(0)).alias("nb")
        ).agg(F.sum("nb").alias("n_bi"))
    )
    c1 = uni.select(F.col("w").alias("w1"), F.col("c_w").alias("cw1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c_w").alias("cw2"))
    pmi = F.round(
        F.log(
            (
                F.col("c_ab").cast("double")
                * F.col("n_uni").cast("double")
                * F.col("n_uni").cast("double")
            )
            / (
                F.col("n_bi").cast("double")
                * F.col("cw1").cast("double")
                * F.col("cw2").cast("double")
            )
        ),
        6,
    )
    return (
        bi.join(F.broadcast(totals))
        .join(c1, "w1")
        .join(c2, "w2")
        .withColumn("pmi", pmi)
        .select("w1", "w2", "c_ab", "pmi")
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(_PMI_TOPN)
    )


# ---------------------------------------------------------------------------
# q135 — deterministic hash-based train/val/test split
# ---------------------------------------------------------------------------


@query(
    "q135_train_split",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 10 AS h
      FROM documents)
    SELECT CASE WHEN h < 8 THEN 'train'
                WHEN h = 8 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM s
    GROUP BY 1
    ORDER BY split
    """,
)
def q135_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by md5 of the
    document id — THE splitting discipline for training corpora: stable
    under reruns, engine-independent, order-independent, and new
    documents never move existing ones between splits (unlike
    randomSplit, which reshuffles everything when the row count
    changes). The hash is the first 16 bits of md5 — portable everywhere
    an oracle runs; the per-split token totals are the numbers a
    pretraining data card reports. One scan, three-row output."""
    d = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    split = (
        F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
    )
    return (
        d.select(
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
            "doc_id",
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# q136 — Kneser-Ney continuation counts
# ---------------------------------------------------------------------------

_KN_TOPN = 30


@query(
    "q136_continuation_counts",
    oracle=f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS tk FROM documents),
    bi AS (
      SELECT DISTINCT tk[i] AS prev, tk[i + 1] AS w
      FROM toks, UNNEST(range(1, len(tk))) AS u(i))
    SELECT w, CAST(COUNT(*) AS BIGINT) AS continuation_count
    FROM bi
    GROUP BY w
    ORDER BY continuation_count DESC, w
    LIMIT {_KN_TOPN}
    """,
)
def q136_continuation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation counts: for each word, the number of
    DISTINCT left contexts it follows — the KN-smoothing statistic that
    replaces raw frequency for lower-order LM weights ('Francisco' is
    frequent but only ever follows 'San'). Bigram pairs explode from the
    staged token arrays, the DISTINCT (prev, w) dedup and the per-word
    count are two map-side-combined aggregations on the same key — AQE
    coalesces the second into a near-free stage. Top-k ties break on the
    word."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("tk"))
    gram_idx = F.when(
        F.size("tk") >= 2, F.sequence(F.lit(1), F.size("tk") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = (
        toks.select(
            F.explode(
                F.transform(
                    gram_idx,
                    lambda i: F.struct(
                        F.element_at(F.col("tk"), i).alias("prev"),
                        F.element_at(F.col("tk"), i + 1).alias("w"),
                    ),
                )
            ).alias("g")
        )
        .select("g.prev", "g.w")
        .distinct()
    )
    return (
        bi.groupBy("w")
        .agg(F.count("*").alias("continuation_count"))
        .orderBy(F.col("continuation_count").desc(), "w")
        .limit(_KN_TOPN)
    )


# ---------------------------------------------------------------------------
# q139 — train/test split decontamination (cross-split 8-gram overlap)
# ---------------------------------------------------------------------------

_CTM_N = 8

_NORM_SQL = (
    "regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')"
)
_TOKS_SQL = f"list_filter(string_split({_NORM_SQL}, ' '), x -> x != '')"


@query(
    "q139_split_contamination",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 10 AS h,
             {_TOKS_SQL} AS tk
      FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id, h,
             array_to_string(tk[i : i + {_CTM_N} - 1], ' ') AS shingle
      FROM s, UNNEST(range(1, len(tk) - {_CTM_N} + 2)) AS u(i)
      WHERE len(tk) >= {_CTM_N}),
    -- hot-shingle cap mirrored from the engine's drop_hot_buckets
    -- (ADVICE r5 item 2): shingles above the doc-frequency cap are
    -- dropped on BOTH sides, so the oracle states the actual semantics
    sh AS (
      SELECT sh0.* FROM sh0
      JOIN (SELECT shingle FROM sh0 GROUP BY shingle
            HAVING COUNT(*) <= {100_000}) ok USING (shingle))
    SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM sh tr JOIN sh te
      ON tr.shingle = te.shingle AND tr.h < 8 AND te.h = 9
    GROUP BY 1, 2
    """,
)
def q139_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test decontamination sweep: (train doc, test doc) pairs
    sharing an 8-token shingle ACROSS the q135 hash split — the overlap
    audit every pretraining/eval pipeline must run before reporting
    benchmark numbers. Inverted-index shape on the shingle (never
    train×test cross product) with the standard hot-shingle cap; the
    distinct (doc, shingle) set is built once and split by the same md5
    bucket as q135, so this composes with the split it audits. At 100 TB
    the test side is tiny and the index join prunes to shingles that
    appear on BOTH sides."""
    from .functions.text import tokens as _tokens
    from .dedup.ngram import ngrams_from_tokens

    d = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    sh = (
        d.select("doc_id", h.alias("h"), _tokens("text").alias("_toks"))
        .select(
            "doc_id",
            "h",
            F.explode(ngrams_from_tokens(F.col("_toks"), _CTM_N)).alias(
                "shingle"
            ),
        )
        .distinct()
        # one materialization: the cap's doc-frequency pass and the
        # train/test join sides all read this — unmaterialized, the
        # shingle explode + distinct would run once per reader
        .localCheckpoint(eager=True)
    )
    sh = drop_hot_buckets(sh, ["shingle"], 100_000)
    train = sh.filter(F.col("h") < 8).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    test = sh.filter(F.col("h") == 9).select(
        F.col("doc_id").alias("test_doc"), "shingle"
    )
    return (
        train.join(test, "shingle")
        .groupBy("train_doc", "test_doc")
        .agg(F.count("*").alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# q147 — deterministic ordered string aggregation (listagg)
# ---------------------------------------------------------------------------


@query(
    "q147_ordered_string_agg",
    oracle="""
    WITH top3 AS (
      SELECT c_mktsegment, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
    SELECT c_mktsegment,
           string_agg(c_name, '|' ORDER BY rn) AS top_names,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM top3 WHERE rn <= 3
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q147_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): the 3 highest-balance
    customer names per market segment concatenated in rank order.
    ``collect_list`` is famously NON-deterministic in Spark (partition
    arrival order); the deterministic discipline is collect structs of
    (rank, value), ``array_sort`` (rank leads the struct, so struct
    ordering = rank ordering), then project + ``concat_ws`` — turning the
    one aggregate people most often get wrong distributed into a
    bit-stable one. Rank itself is tie-broken on the key."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    top3 = c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return (
        top3.groupBy("c_mktsegment")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "c_name"))
                    ),
                    lambda s: s["c_name"],
                ),
            ).alias("top_names"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q148 — time-weighted average value per user (TWAP)
# ---------------------------------------------------------------------------


@query(
    "q148_time_weighted_value",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, ts,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
      FROM events WHERE user_id % 11 = 0),
    seg AS (
      SELECT user_id,
             CAST(value AS DECIMAL(28,6))
               * date_diff('microsecond', ts, nxt) AS wv,
             date_diff('microsecond', ts, nxt) AS w
      FROM seq WHERE nxt IS NOT NULL)
    SELECT user_id,
           ROUND(CAST(SUM(wv) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 9)
             AS twap,
           CAST(SUM(w) AS BIGINT) AS covered_micros,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM seg
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q148_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's reading — each value holds
    until the next event, so its weight is the gap in seconds (the
    TWAP/monitoring aggregation a last-observation time series needs;
    plain AVG over-weights bursts). Gaps come from one lead window per
    user (parallel); weights are INTEGER microseconds (timestampdiff on
    the NTZ timestamps — no timezone in play; MICROSECOND granularity
    because coarser units disagree across engines: Spark floors the
    elapsed time, DuckDB counts calendar-boundary crossings, and at the
    timestamps' native micro resolution the two definitions coincide)
    and the weighted sum
    accumulates in DECIMAL. The final ratio lands on the 9-dp grid:
    wide-DECIMAL→double conversion is the one step engines implement
    differently (one correctly-rounded conversion vs int128-then-scale —
    a last-ulp hazard), and the grid absorbs it, the q125 discipline."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 11 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "value", "ts", F.lead("ts").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    mics = F.expr("timestampdiff(MICROSECOND, ts, nxt)")
    seg = seq.select(
        "user_id",
        (F.col("value").cast("decimal(28,6)") * mics).alias("wv"),
        mics.alias("w"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.round(
                F.sum("wv").cast("double") / F.sum("w").cast("double"), 9
            ).alias("twap"),
            F.sum("w").cast("long").alias("covered_micros"),
            F.count("*").alias("n_segments"),
        )
        .orderBy("user_id")
    )
