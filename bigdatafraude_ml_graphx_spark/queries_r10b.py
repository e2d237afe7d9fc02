"""Round-10 batch 2: corpus-curation operators a production training-data
pipeline runs between dedup and packing.

- q239: per-source document quota (the CommonCrawl-style domain cap) — keep
  the top-k documents per source by quality rank, a WindowGroupLimit plan.
- q240: cross-document duplicate SPANS — merge runs of consecutive
  corpus-duplicated trigrams into maximal spans per document (the positional
  form of exact-substring dedup from Lee et al. 2022; q238 reports the
  scalar fraction, this returns the actual char-aligned token spans a
  remove-duplicated-substrings pass would cut).
- q241: source×source shingle-overlap matrix — which sources duplicate each
  other (mirror-site / syndication detection), a source-level Jaccard whose
  join cost is bounded by the source cardinality, not the corpus.

All three certify exactly against DuckDB oracles that mirror the canonical
tokenizer (``functions/text.py:normalize_text``) expression-for-expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query
from .queries_r10 import _DF_FRAC
from .queries_text import _TOKS, _hash_sql

_QUOTA_K = 10

_POS_GRAMS_CTE = f"""
    d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id AS doc,
                 CAST(unnest(range(1, greatest(len(toks) - 1, 1))) - 1
                      AS BIGINT) AS pos,
                 unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                       i -> array_to_string(toks[i:i+2], ' ')))
                   AS gram
          FROM d WHERE len(toks) >= 3)
"""


@query(
    "q239_source_quota",
    oracle=f"""
    SELECT source, doc_id, n_chars, rk FROM (
      SELECT source, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
      FROM documents)
    WHERE rk <= {_QUOTA_K}
    """,
)
def q239_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota — the domain-cap pass every web-scale
    corpus runs so one prolific domain cannot dominate the training mix
    (the reference's per-entity caps are driver-side pandas slices,
    notebooks/2_exploration.ipynb; here it is one hash-partitioned window).
    Keep the top-k documents per source by quality rank (n_chars desc,
    doc_id tiebreak — deterministic). The ``rank <= k`` filter compiles to
    WindowGroupLimit, so each partition retains only k rows BEFORE the
    final window sort — at 100 TB the shuffle carries the full corpus once
    (unavoidable: quota is a per-source global decision) but the sort/state
    per source is O(k), never O(docs-per-source)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _QUOTA_K)
        .select("source", "doc_id", "n_chars", "rk")
    )


@query(
    "q240_duplicate_spans",
    oracle=f"""
    WITH {_POS_GRAMS_CTE},
    dup AS (SELECT gram FROM (SELECT DISTINCT doc, gram FROM g)
            GROUP BY gram HAVING COUNT(*) >= 2),
    p AS (SELECT g.doc, g.pos FROM g JOIN dup USING (gram)),
    brk AS (SELECT doc, pos,
                   CASE WHEN pos - LAG(pos) OVER
                          (PARTITION BY doc ORDER BY pos) > 2
                        THEN 1 ELSE 0 END AS new_isl
            FROM p),
    isl AS (SELECT doc, pos,
                   SUM(new_isl) OVER
                     (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING)
                     AS grp
            FROM brk)
    SELECT doc,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 2 AS BIGINT) AS span_end,
           CAST(MAX(pos) + 2 - MIN(pos) + 1 AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc, grp
    HAVING MAX(pos) + 2 - MIN(pos) + 1 >= 8
    """,
)
def q240_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated token spans — the positional form
    of exact-substring dedup (Lee et al. 2022): a trigram is *duplicated*
    when it occurs in ≥2 distinct documents; duplicated trigram positions
    whose 3-token windows OVERLAP in token space (position gap ≤ 2) merge
    into one span (gaps-and-islands via a lag-threshold running sum), so
    the returned spans are DISJOINT in token coordinates — summing
    ``span_tokens`` never double-counts and a consumer may cut span-by-span
    (the r10 contract allowed a 1-token overlap between islands separated
    by one non-duplicated gram; ADVICE r10 #3 closed). Spans covering
    fewer than 8 tokens are noise and dropped. Returns ``(doc, span_start,
    span_end, span_tokens)`` in token coordinates — the cut-list a
    remove-duplicated-substrings pass consumes.

    Scale shape: LINEAR end-to-end — the positional gram stream joins the
    duplicated-gram list semi-join-style (each (doc,pos) row matches at
    most once; posting lists are never self-joined, so boilerplate cannot
    go quadratic — contrast q27), and the islands window partitions by doc
    with an O(spans) aggregate. The duplicated-gram list is df-filtered
    AFTER a map-side-combinable distinct+count, never collected."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs).select(
        "doc", "span_start", "span_end", "span_tokens"
    )


def duplicate_spans(docs: DataFrame) -> DataFrame:
    """q240's pipeline over an arbitrary documents frame — factored so
    composition queries (q251 per-source savings) reuse the exact
    certified lineage. Returns token-disjoint ``(doc, span_start,
    span_end, span_tokens)`` spans (≥ 8 covered tokens)."""
    from .dedup.ngram import ngrams_from_tokens
    from .functions.text import tokens

    grams = (
        docs.select(F.col("doc_id").alias("doc"), tokens("text").alias("_toks"))
        .select(
            "doc",
            F.posexplode(ngrams_from_tokens(F.col("_toks"), 3)).alias(
                "pos", "gram"
            ),
        )
    )
    # The positional stream feeds both the document-frequency aggregate and
    # the position join; one tokenize pass, not two. localCheckpoint (the
    # codebase's multi-consumer convention) rather than a bare persist() —
    # nothing is left registered in the CacheManager after the query runs.
    grams = grams.localCheckpoint(eager=True)
    dup = (
        grams.select("doc", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("gram")
    )
    pos_dup = grams.join(dup, "gram", "left_semi").select("doc", "pos")
    return _merge_spans(pos_dup)


def _merge_spans(pos_dup: DataFrame) -> DataFrame:
    """Gaps-and-islands over duplicated trigram positions, merging islands
    whose 3-token windows overlap (position gap ≤ 2) so output spans are
    token-disjoint. ``span_tokens`` is the covered token count
    ``span_end − span_start + 1`` — exact for merged islands too, because a
    gap of ≤ 2 gram positions leaves no token inside the merged range
    uncovered ([p, p+2] ∪ [p+g, p+g+2] is contiguous for g ≤ 3)."""
    w = Window.partitionBy("doc").orderBy("pos")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    isl = pos_dup.withColumn(
        "grp",
        F.sum(
            F.when(F.col("pos") - F.lag("pos").over(w) > 2, 1).otherwise(0)
        ).over(wrun),
    )
    return (
        isl.groupBy("doc", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + 2).cast("long").alias("span_end"),
            (F.max("pos") + 2 - F.min("pos") + 1).cast("long").alias(
                "span_tokens"
            ),
        )
        .filter(F.col("span_tokens") >= 8)
    )


_SPANS_SQL = f"""
    dup AS (SELECT gram FROM (SELECT DISTINCT doc, gram FROM g)
            GROUP BY gram HAVING COUNT(*) >= 2),
    p AS (SELECT g.doc, g.pos FROM g JOIN dup USING (gram)),
    brk AS (SELECT doc, pos,
                   CASE WHEN pos - LAG(pos) OVER
                          (PARTITION BY doc ORDER BY pos) > 2
                        THEN 1 ELSE 0 END AS new_isl
            FROM p),
    isl AS (SELECT doc, pos,
                   SUM(new_isl) OVER
                     (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING)
                     AS grp
            FROM brk),
    spans AS (SELECT doc, MIN(pos) AS s, MAX(pos) + 2 AS e
              FROM isl GROUP BY doc, grp
              HAVING MAX(pos) + 2 - MIN(pos) + 1 >= 8)
"""


@query(
    "q242_cut_duplicate_spans",
    oracle=f"""
    WITH {_POS_GRAMS_CTE},
    {_SPANS_SQL},
    tok AS (SELECT doc_id AS doc,
                   CAST(unnest(range(1, len(toks) + 1)) - 1 AS BIGINT) AS pos,
                   unnest(toks) AS tok
            FROM d),
    cut AS (SELECT DISTINCT t.doc, t.pos
            FROM tok t JOIN spans s
              ON t.doc = s.doc AND t.pos BETWEEN s.s AND s.e),
    kept AS (SELECT tok.doc, tok.pos, tok.tok
             FROM tok ANTI JOIN cut USING (doc, pos)),
    agg AS (SELECT doc,
                   string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                   CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY doc)
    SELECT d.doc_id AS doc,
           COALESCE(agg.clean_text, '') AS clean_text,
           COALESCE(agg.n_kept, 0) AS n_kept,
           CAST(len(d.toks) AS BIGINT) - COALESCE(agg.n_kept, 0) AS n_removed
    FROM d LEFT JOIN agg ON d.doc_id = agg.doc
    """,
)
def q242_cut_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply q240's cut-list: remove every token covered by a duplicated
    span (≥8 tokens, shared with ≥1 other document) and re-emit the
    cleaned text — the actual remove-duplicated-substrings transform of
    Lee et al. 2022 (ExactSubstr), not just its diagnostic. Every document
    appears in the output; a fully-duplicated document survives as an
    empty string with ``n_removed = |tokens|`` (the downstream length
    filter, q26's job, then drops it — dedup and quality filtering stay
    separable passes).

    Scale shape: linear like q240 (posting lists never self-joined), plus
    a per-doc reassembly aggregate whose state is one document's tokens —
    ``collect_list(struct(pos,tok))`` is bounded by document length, the
    same per-group bound every window over a doc already carries. Span
    ranges explode into at most |tokens| cut positions per doc."""
    from .dedup.ngram import ngrams_from_tokens
    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id").alias("doc"), tokens("text").alias("_toks")
    )
    # One tokenize pass feeds the gram stream, the token stream, and the
    # final all-docs frame — localCheckpoint (the multi-consumer
    # convention), never a bare persist() left in the CacheManager.
    base = base.localCheckpoint(eager=True)
    grams = base.select(
        "doc",
        F.posexplode(ngrams_from_tokens(F.col("_toks"), 3)).alias(
            "pos", "gram"
        ),
    ).localCheckpoint(eager=True)
    dup = (
        grams.select("doc", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("gram")
    )
    spans = _merge_spans(
        grams.join(dup, "gram", "left_semi").select("doc", "pos")
    ).select(
        "doc",
        F.col("span_start").alias("s"),
        F.col("span_end").alias("e"),
    )
    # Merged spans are token-disjoint, so the explode emits each cut
    # position exactly once — distinct retained purely as an invariant
    # guard (it is a no-op on disjoint spans).
    cut = spans.select(
        "doc", F.explode(F.sequence("s", "e")).alias("pos")
    ).distinct()
    toks = base.select(
        "doc", F.posexplode("_toks").alias("pos", "tok")
    )
    kept = toks.join(cut, ["doc", "pos"], "left_anti")
    agg = kept.groupBy("doc").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("clean_text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    return (
        base.select("doc", F.size("_toks").cast("long").alias("_nt"))
        .join(agg, "doc", "left")
        .select(
            "doc",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            (F.col("_nt") - F.coalesce("n_kept", F.lit(0).cast("long"))).alias(
                "n_removed"
            ),
        )
    )


_TFDF_TAU = 0.5
_TFDF_SCALE = 1_000_000.0


@query(
    "q243_tfdf_cosine_pairs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf0 AS (SELECT doc_id AS doc,
                   unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                         i -> array_to_string(toks[i:i+2], ' ')))
                     AS term_s
            FROM d),
    tf AS (SELECT doc, {_hash_sql('term_s', 0)} AS term FROM tf0),
    tfc AS (SELECT doc, term, COUNT(*) AS tf FROM tf GROUP BY doc, term),
    dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term
            HAVING COUNT(*) <= {_DF_FRAC} * (SELECT COUNT(*) FROM documents)),
    w AS (SELECT tfc.doc, tfc.term,
                 CAST(FLOOR(CAST(tfc.tf AS DOUBLE) / CAST(dfc.df AS DOUBLE)
                            * {_TFDF_SCALE}) AS BIGINT) AS wq
          FROM tfc JOIN dfc USING (term)),
    norms AS (SELECT doc, SUM(wq * wq) AS n2 FROM w GROUP BY doc),
    dots AS (SELECT a.doc AS doc_a, b.doc AS doc_b, SUM(a.wq * b.wq) AS qdot
             FROM w a JOIN w b ON a.term = b.term AND a.doc < b.doc
             GROUP BY 1, 2)
    SELECT doc_a, doc_b, cosine_q FROM (
      SELECT doc_a, doc_b,
             CAST(qdot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE))
                                  / sqrt(CAST(nb.n2 AS DOUBLE)) AS cosine_q
      FROM dots JOIN norms na ON doc_a = na.doc
                JOIN norms nb ON doc_b = nb.doc)
    WHERE cosine_q >= {_TFDF_TAU}
    """,
)
def q243_tfdf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse LEXICAL similarity pairs: cosine over inverse-df-weighted
    trigram-shingle vectors (weight = tf/df), via the inverted-index join
    with the 2%-of-corpus df cap — the weighted sibling of q27's set
    Jaccard (tf keeps within-doc multiplicity; rare shingles dominate the
    dot product) and the lexical counterpart of the dense-embedding q46.
    The unit is the SHINGLE, not the token: real similarity signal lives
    in n-gram combinations (single-token df is degenerate on any corpus
    with a bounded vocabulary — on the testdata every token is in ≥5% of
    docs, so a token-level df cap keeps nothing). tf/df rather than the
    textbook
    ``tf·ln(N/df)`` because the certified cross-engine path quantizes
    weights to fixed point, and ``ln`` is the one operation whose last
    ulp may differ between Java's Math.log and DuckDB's libm — IEEE
    division is bit-deterministic, transcendentals are not. Weights
    quantize to BIGINT (⌊w·10⁶⌋); dot products and norms are exact
    integer sums (order-independent — no decimal helper needed), and the
    final cosine divides in a pinned order both engines mirror.

    Scale shape: the df cap bounds every posting list at 2% of the corpus
    BEFORE the self-join (boilerplate/stopword terms never reach it), and
    the weight join is linear — one df row per (doc, term) row, the q238
    shape. Overflow headroom: wq ≤ tf·10⁶ ≤ ~10⁸ for any real document,
    so Σ wq² stays < 2⁶³ below ~10⁴⁶ tokens per doc."""
    from .dedup.minhash import _hash64
    from .dedup.ngram import _doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # Terms are the portable 60-bit md5 hash of the trigram (oracle mirrors
    # it via _hash_sql) — hashing BEFORE the first groupBy shrinks the
    # (doc, term) shuffle, the checkpointed tf blocks, and every downstream
    # join key from ~25-byte strings to longs (measured: the string-keyed
    # form cost +14 s at sf1.0). Hash collisions merge two trigrams'
    # counts; at 60 bits over a ≤10⁹-term vocabulary that is ~10⁻¹⁸ per
    # pair, and BOTH engines hash identically, so exactness is preserved
    # regardless.
    tf = (
        _doc_shingles(docs, "text", "doc_id", 3, distinct=False)
        .select("doc", _hash64(F.col("shingle"), 0).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    # Checkpoint tf (not just w): dfc and w BOTH contain the tf subplan, and
    # an eager-checkpoint materialization does not collapse the duplicate
    # branches the way a cached InMemoryRelation did — checkpointing the
    # common ancestor keeps the corpus scan at one (replay budget: 2 opens
    # incl. the n_docs count), with no CacheManager residue.
    tf = tf.localCheckpoint(eager=True)
    dfc = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= F.lit(_DF_FRAC) * n_docs)
    )
    w = tf.join(dfc, "term").select(
        "doc",
        "term",
        F.floor(
            F.col("tf").cast("double")
            / F.col("df").cast("double")
            * F.lit(_TFDF_SCALE)
        )
        .cast("long")
        .alias("wq"),
    )
    # w is deliberately NOT materialized: its three consumers (norms + both
    # join sides) recompute the cheap capped join from tf's checkpoint
    # blocks (zero file opens), which measured ~10 s faster at sf1.0 than a
    # second eager materialization — tf is the only frame worth storing.
    norms = w.groupBy("doc").agg(F.sum(F.col("wq") * F.col("wq")).alias("n2"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.sum(F.col("a.wq") * F.col("b.wq")).alias("qdot"))
    )
    na = norms.select(F.col("doc").alias("doc_a"), F.col("n2").alias("_na"))
    nb = norms.select(F.col("doc").alias("doc_b"), F.col("n2").alias("_nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cosine_q",
            F.col("qdot").cast("double")
            / F.sqrt(F.col("_na").cast("double"))
            / F.sqrt(F.col("_nb").cast("double")),
        )
        .filter(F.col("cosine_q") >= _TFDF_TAU)
        .select("doc_a", "doc_b", "cosine_q")
    )


@query(
    "q241_source_overlap",
    oracle=f"""
    WITH d AS (SELECT source, {_TOKS} AS toks FROM documents),
    sh AS (SELECT DISTINCT source, shingle
           FROM (SELECT source,
                        unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                              i -> array_to_string(toks[i:i+2], ' ')))
                          AS shingle
                 FROM d)),
    sizes AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source),
    shared AS (SELECT a.source AS source_a, b.source AS source_b,
                      CAST(COUNT(*) AS BIGINT) AS shared
               FROM sh a JOIN sh b
                 ON a.shingle = b.shingle AND a.source < b.source
               GROUP BY 1, 2)
    SELECT s.source_a, s.source_b, s.shared,
           CAST(s.shared AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE) AS jaccard
    FROM shared s
    JOIN sizes sa ON s.source_a = sa.source
    JOIN sizes sb ON s.source_b = sb.source
    WHERE CAST(s.shared AS DOUBLE)
            / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE) >= 0.01
    """,
)
def q241_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source×source shingle-overlap matrix — which SOURCES duplicate each
    other (mirror sites, syndicated feeds, scraper overlap): Jaccard over
    each source's distinct-trigram set, reported for pairs above 1%. The
    per-pair numbers tell a curation pipeline which source pairs need
    cross-source dedup at all (and q27/q233 then find the document pairs).

    Scale shape: the self-join key is the shingle, but each posting list is
    bounded by the SOURCE cardinality (≤ |sources| rows per shingle after
    the source-level distinct), so the join output is ≤ |distinct shingles|
    · C(|sources|,2) in the worst case and in practice ~|shingles| — never
    corpus-quadratic. The aggregate output is at most C(|sources|,2) rows:
    dim-sized, broadcast-joinable against the sizes frame."""
    from .dedup.ngram import ngrams_from_tokens
    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("source", tokens("text").alias("_toks"))
        .select(
            "source",
            F.explode(ngrams_from_tokens(F.col("_toks"), 3)).alias("shingle"),
        )
        .distinct()
    )
    # Feeds sizes and both join sides — one tokenize pass; localCheckpoint
    # per the multi-consumer convention (no CacheManager residue).
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_sh").alias("_na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_sh").alias("_nb")
    )
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.01)
        .select("source_a", "source_b", "shared", "jaccard")
    )
