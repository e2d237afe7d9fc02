"""Round-7 batch 2: the LLM-corpus curation stages the engine still lacked —
perplexity-bucket filtering (CCNet), DSIR importance weights, common-n-gram
boilerplate scrubbing, and BPE *encoding* (q186 trains the merges; q216
applies them).

Determinism: every log-probability rides the q167 6-dp ln grid → int64
MICROS; bucket decisions are integer cross-multiplications (never a double
threshold compare); n-gram machinery is exact string counting; the BPE
encode replays q186's double-space replace semantics, which are identical
in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .plans.hints import broadcast_if_small
from .queries import query

_NORM_SQL = (
    "regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')"
)
_TOKS_SQL = f"list_filter(string_split({_NORM_SQL}, ' '), x -> x != '')"

# Shared oracle prelude: per-token corpus log-probs on the int64-MICROS grid
# (the q167 determinism contract — ln on the 6-dp grid, summed as exact
# integers, so both engines see bit-identical operands).
_LM_SQL = f"""
    tok AS (SELECT doc_id, lang, unnest({_TOKS_SQL}) AS tok FROM documents),
    counts AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM counts),
    lp AS (
      SELECT c.tok,
             CAST(CAST(ROUND(ln(CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)), 6)
                       AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS lp_micros
      FROM counts c, tot t)"""


def _lm_frames(spark: SparkSession, sf_dir: str):
    """(token stream, per-token lp_micros) — the engine twin of _LM_SQL."""
    from .functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", tokens("text").alias("_t")).select(
        "doc_id", "lang", F.explode("_t").alias("tok")
    )
    # Vocab-sized; read twice (total + log-prob projection) — bare, the
    # scalar total re-ran the whole count pass (3 corpus scans measured).
    counts = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(F.sum("cnt").alias("total"))
    lp = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        (
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("total").cast("double")),
                6,
            ).cast("decimal(18,6)")
            * 1_000_000
        )
        .cast("long")
        .alias("lp_micros"),
    )
    return tok, lp


# ---------------------------------------------------------------------------
# q213 — perplexity-bucket filter census (the CCNet head/middle/tail cut)
# ---------------------------------------------------------------------------

_PPL_KEEP_MICROS = -3_401_000    # avg logprob >= -3.401  -> "keep"
_PPL_REVIEW_MICROS = -3_410_000  # avg logprob >= -3.410  -> "review"


@query(
    "q213_perplexity_filter",
    oracle=f"""
    WITH {_LM_SQL},
    d AS (
      SELECT s.doc_id, ANY_VALUE(s.lang) AS lang,
             CAST(SUM(l.lp_micros) AS BIGINT) AS slp,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM tok s JOIN lp l ON l.tok = s.tok
      GROUP BY s.doc_id),
    b AS (
      SELECT lang, n,
             CASE WHEN slp >= n * {_PPL_KEEP_MICROS} THEN 'keep'
                  WHEN slp >= n * {_PPL_REVIEW_MICROS} THEN 'review'
                  ELSE 'drop' END AS bucket
      FROM d)
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens
    FROM b GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)
def q213_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-bucket filtering census — the CCNet head/middle/tail cut
    with the n-gram order at 1 (q167 computes the per-doc score; this makes
    the DECISION and reports the per-language survivor census a curation
    run needs before committing thresholds). The bucket test is an integer
    cross-multiplication ``sum_lp_micros >= n_tokens * T_micros`` — never a
    double division compare, so the boundary is bit-exact on any engine.
    Scale: one vocab rollup (broadcast back), one token-stream aggregate —
    the corpus is scanned twice and shuffled by doc_id once."""
    tok, lp = _lm_frames(spark, sf_dir)
    d = (
        tok.join(broadcast_if_small(lp), "tok")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.sum("lp_micros").cast("long").alias("slp"),
            F.count("*").cast("long").alias("n"),
        )
    )
    bucket = (
        F.when(F.col("slp") >= F.col("n") * _PPL_KEEP_MICROS, "keep")
        .when(F.col("slp") >= F.col("n") * _PPL_REVIEW_MICROS, "review")
        .otherwise("drop")
    )
    return (
        d.select("lang", bucket.alias("bucket"), "n")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("n_tokens"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# q214 — DSIR importance weights (target-vs-source unigram log-ratio)
# ---------------------------------------------------------------------------

_DSIR_TARGET_LANG = "en"
_DSIR_TOPN = 20


@query(
    "q214_dsir_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_TOKS_SQL}) AS tok FROM documents),
    vocab AS (SELECT DISTINCT tok FROM tok),
    vsize AS (SELECT COUNT(*) AS v FROM vocab),
    src AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    stot AS (SELECT SUM(cnt) AS total FROM src),
    tgt AS (SELECT tok, COUNT(*) AS cnt FROM tok
            WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY tok),
    ttot AS (SELECT COALESCE(SUM(cnt), 0) AS total FROM tgt),
    ratio AS (
      SELECT v.tok,
             CAST(CAST(ROUND(
               ln((CAST(COALESCE(t.cnt, 0) AS DOUBLE) + 1)
                  / CAST(tt.total + vs.v AS DOUBLE))
               - ln((CAST(s.cnt AS DOUBLE) + 1)
                    / CAST(st.total + vs.v AS DOUBLE)), 6)
               AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS lr_micros
      FROM vocab v
      JOIN src s ON s.tok = v.tok
      LEFT JOIN tgt t ON t.tok = v.tok,
      stot st, ttot tt, vsize vs)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(r.lr_micros) AS BIGINT) AS weight_micros
    FROM tok s JOIN ratio r ON r.tok = s.tok
    GROUP BY s.doc_id
    ORDER BY weight_micros DESC, s.doc_id LIMIT {_DSIR_TOPN}
    """,
)
def q214_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    log-likelihood ratio between a TARGET unigram LM (the '{en}' slice —
    the high-quality domain) and the SOURCE LM (the full corpus), both
    Laplace-smoothed over the shared vocabulary. Docs that score high are
    the ones importance resampling would upweight. Per-token log-ratios
    are computed once on the vocab rollup (6-dp ln grid → int64 micros),
    broadcast onto the token stream, and summed exactly — the top-{20}
    cut is a TakeOrderedAndProject with an integer (weight, doc_id) total
    order. Scale: ONE vocab-sized rollup — the source and target counts
    are conditional aggregates of the SAME groupBy (a conditional count
    with 0-default is exactly the oracle's vocab LEFT JOIN tgt), and the
    rollup localCheckpoints because the scalar totals and the ratio table
    both derive from it — so the corpus is scanned exactly twice (count
    pass + weight pass; the separate src/tgt/consts frames measured 5
    documents scans before the fusion)."""
    from .functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", tokens("text").alias("_t")).select(
        "doc_id", "lang", F.explode("_t").alias("tok")
    )
    counts = (
        tok.groupBy("tok")
        .agg(
            F.count("*").alias("scnt"),
            F.count(
                F.when(F.col("lang") == _DSIR_TARGET_LANG, True)
            ).alias("tcnt"),
        )
        .localCheckpoint(eager=True)  # vocab-sized; read 2x (consts + ratio)
    )
    consts = counts.agg(
        F.sum("scnt").alias("stot"),
        F.count("*").alias("v"),
        F.sum("tcnt").alias("ttot"),
    )
    ratio = (
        counts.crossJoin(F.broadcast(consts))
        .select(
            "tok",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("tcnt"), F.lit(0)).cast("double") + 1)
                        / (F.col("ttot") + F.col("v")).cast("double")
                    )
                    - F.log(
                        (F.col("scnt").cast("double") + 1)
                        / (F.col("stot") + F.col("v")).cast("double")
                    ),
                    6,
                ).cast("decimal(18,6)")
                * 1_000_000
            )
            .cast("long")
            .alias("lr_micros"),
        )
    )
    return (
        tok.join(broadcast_if_small(ratio), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("lr_micros").cast("long").alias("weight_micros"),
        )
        .orderBy(F.col("weight_micros").desc(), "doc_id")
        .limit(_DSIR_TOPN)
    )


# ---------------------------------------------------------------------------
# q215 — common-n-gram boilerplate scrub census
# ---------------------------------------------------------------------------

_BOILER_N = 3       # n-gram order
_BOILER_DF = 5      # appears in >= 5 distinct docs -> boilerplate


@query(
    "q215_boilerplate_ngrams",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {_TOKS_SQL} AS l FROM documents),
    grams AS (
      SELECT doc_id, source,
             unnest(list_transform(
               generate_series(1, len(l) - {_BOILER_N - 1}),
               i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS g
      FROM base WHERE len(l) >= {_BOILER_N}),
    boiler AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(DISTINCT doc_id) >= {_BOILER_DF}),
    flagged AS (
      SELECT gr.source, (b.g IS NOT NULL) AS is_boiler
      FROM grams gr LEFT JOIN boiler b ON b.g = gr.g)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COALESCE(SUM(CASE WHEN is_boiler THEN 1 END), 0) AS BIGINT)
             AS n_boiler,
           CAST(COALESCE(SUM(CASE WHEN is_boiler THEN 1 END), 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS boiler_ratio
    FROM flagged GROUP BY source ORDER BY source
    """,
)
def q215_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-n-gram boilerplate scrub census — the cross-document
    repetition filter (CCNet's paragraph dedup / C4's boilerplate rule,
    at n-gram granularity because the synthetic docs are single-line):
    a {3}-gram is boilerplate when it appears in >= {5} distinct
    documents; per source, report how much of the gram stream a scrub
    would remove. The gram table is built WITHOUT a self-join — one
    ``transform(sequence(...))`` over the token array per doc — and the
    boilerplate set is a vocab-sized rollup broadcast back as a LEFT
    join (null = clean). Scale: one corpus scan to grams, one
    gram-keyed rollup, one broadcast join — no pair explosion
    anywhere."""
    from .functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", tokens("text").alias("l")).filter(
        F.size("l") >= _BOILER_N
    )
    grams = base.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(l) - {_BOILER_N - 1}),"
                " i -> concat_ws(' ', l[i-1], l[i], l[i+1]))"
            )
        ).alias("g"),
    )
    boiler = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BOILER_DF)
        .select("g", F.lit(True).alias("_boiler"))
    )
    flagged = grams.join(broadcast_if_small(boiler), "g", "left_outer")
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.coalesce(F.sum(F.when(F.col("_boiler"), 1)), F.lit(0))
            .cast("long")
            .alias("n_boiler"),
        )
        .select(
            "source",
            "n_grams",
            "n_boiler",
            (
                F.col("n_boiler").cast("double") / F.col("n_grams").cast("double")
            ).alias("boiler_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q216 — BPE encode: apply the q186 merges, measure compression
# ---------------------------------------------------------------------------

_ENC_ROUNDS = 3


def _bpe_encode_oracle(rounds: int) -> str:
    """Reuses q186's unrolled MATERIALIZED rounds to derive the SAME merge
    sequence independently, then applies it: the final c{rounds} table maps
    each distinct word to its encoded symbol count, joined back onto the
    per-document token stream (engine twin does exactly this)."""
    parts = [
        """
    WITH w AS MATERIALIZED (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word),
    c0 AS MATERIALIZED (
      SELECT word, '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS seq,
             freq
      FROM w)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    p{r} AS (
      SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt FROM (
        SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i
        FROM (SELECT string_split(trim(seq), '  ') AS l, freq
              FROM c{r - 1}) s) t
      GROUP BY 1, 2),
    m{r} AS MATERIALIZED (
      SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    c{r} AS MATERIALIZED (
      SELECT word, replace(seq, ' ' || m.a || '  ' || m.b || ' ',
                           ' ' || m.a || m.b || ' ') AS seq, freq
      FROM c{r - 1}, m{r} m)"""
        )
    parts.append(
        f""",
    enc AS (
      SELECT word, len(string_split(trim(seq), '  ')) AS n_sym
      FROM c{rounds}),
    stream AS (
      SELECT lang, word FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$'))
    SELECT s.lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(s.word)) AS BIGINT) AS chars_before,
           CAST(SUM(e.n_sym) AS BIGINT) AS symbols_after
    FROM stream s JOIN enc e ON e.word = s.word
    GROUP BY s.lang ORDER BY s.lang"""
    )
    return "".join(parts)


@query("q216_bpe_encode", oracle=_bpe_encode_oracle(_ENC_ROUNDS))
def q216_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — q186 trains the merge list; this applies it to the
    corpus and measures per-language compression (chars in vs symbols
    out), the number a tokenizer build actually decides on. Encoding
    never touches the raw token stream: the {3} learned replaces run on
    the DISTINCT-word table (vocab-sized), each word's encoded symbol
    count joins back onto the per-doc stream via a broadcast, and the
    per-language totals are exact integer sums. The oracle re-derives
    the identical merge sequence with q186's unrolled MATERIALIZED
    rounds, so the greedy history and its application are both
    certified."""
    from .functions.bpe import bpe_merges, word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    # Vocab-sized; read twice (merge training + encoded-width projection)
    # — bare, each re-ran the corpus tokenize+count (3 documents opens
    # measured; the per-doc stream join is the one genuine second pass).
    words = word_frequencies(docs).localCheckpoint(eager=True)
    merges = bpe_merges(words, _ENC_ROUNDS)
    seq = F.concat(F.lit("  "), F.regexp_replace("word", "(.)", "$1  "))
    for _, a, b, _, _ in merges:
        seq = F.replace(seq, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    enc = words.select(
        "word", F.size(F.split(F.trim(seq), "  ")).alias("n_sym")
    )
    stream = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$"))
    return (
        stream.join(broadcast_if_small(enc), "word")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("chars_before"),
            F.sum("n_sym").cast("long").alias("symbols_after"),
        )
        .orderBy("lang")
    )
