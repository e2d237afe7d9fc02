"""Round-11 batch: closing the VERDICT r10 watch items + the release-report
artifacts a dedup/index deployment publishes.

- q249: df-capped contamination sweep — q70's benchmark-overlap check in
  the boilerplate-safe production config (q233's 2%-of-corpus cap applied
  to the contamination join), bounding the one adversary-sensitive query
  left in the hot-content sweep (q70: 50.9× answer growth under the
  hot-CONTENT fixture because every doc "contaminates" every eval doc
  through the shared boilerplate block).
- q250: duplicate-CLUSTER statistics — the dedup report (cluster-size
  histogram + removable-doc counts) over the df-capped Jaccard graph.
- q251: per-source token savings of exact-substring span dedup — composes
  q240's (now token-disjoint) spans with source attribution; exact sums
  are only correct because spans no longer overlap.
- q252: IVF index-health diagnostics — per-cell population and load share
  of the coarse quantizer (the balance check run before deploying an IVF
  index); exactly oracle-checked against the shared assignment CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query
from .queries_r10 import _DF_FRAC, _capped_shingles_cte
from .queries_ann import _ivf_assign_cte
from .queries_r10b import _POS_GRAMS_CTE, _SPANS_SQL, duplicate_spans
from .queries_text import _SHINGLES_CTE, _TOKS

_EVAL_MOD = 50  # every 50th doc stands in for the benchmark set (q70's)
_MIN_SHARED = 2


@query(
    "q249_contamination_df_capped",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING COUNT(*) <= {_DF_FRAC} * (SELECT COUNT(*) FROM documents)),
    shc AS (SELECT sh.doc, sh.shingle FROM sh JOIN keep USING (shingle)),
    ev AS (SELECT doc AS eval_doc, shingle FROM shc
           WHERE doc % {_EVAL_MOD} = 0),
    evn AS (SELECT eval_doc, COUNT(*) AS eval_n FROM ev GROUP BY eval_doc),
    shared AS (SELECT shc.doc, ev.eval_doc, COUNT(*) AS n_shared
               FROM shc JOIN ev ON shc.shingle = ev.shingle
                                AND shc.doc != ev.eval_doc
               GROUP BY shc.doc, ev.eval_doc
               HAVING COUNT(*) >= {_MIN_SHARED})
    SELECT shared.doc, shared.eval_doc,
           CAST(n_shared AS BIGINT) AS n_shared,
           CAST(n_shared AS DOUBLE) / eval_n AS overlap_frac
    FROM shared JOIN evn USING (eval_doc)
    """,
)
def q249_contamination_df_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q70's benchmark-contamination sweep in the boilerplate-safe
    production config: shingles in more than 2% of CORPUS documents are
    dropped before the eval join, and the leakage fraction is computed
    over the capped universe (eval sizes shrink too — the q233
    convention, oracle-mirrored). Rationale: a boilerplate block shared
    corpus-wide makes every doc "contaminate" every eval doc — 50.9×
    answer growth on the hot-content fixture (BENCH_SF1_HOTCONTENT_r10)
    — while carrying zero leakage signal; real benchmark leakage shows
    in RARE shingles, which the cap keeps.

    Scale shape: the capped trigram stream is materialized once (raw
    stream checkpointed — one corpus scan — then df-filtered from its
    blocks); the eval side is a % _EVAL_MOD slice of that SAME capped
    stream (eval ⊆ corpus, so no second tokenize pass). The eval slice
    grows LINEARLY with corpus size (~2% of all capped shingle rows), so
    its broadcast is SIZE-GUARDED (``broadcast_if_small``), never forced:
    under the threshold the hint is free; above it the join degrades to
    sort-merge and AQE re-promotes at runtime if the actual size is small
    — a forced ``F.broadcast`` here would be a driver memory bomb at
    100 TB (VERDICT r11 #1). Posting lists are bounded at 2%·N before the
    join, so the join output per shingle is ≤ 0.02·N·|eval docs sharing
    it| — never the B² of the uncapped adversary case."""
    from .dedup.ngram import _doc_shingles
    from .operators.skew import drop_hot_buckets
    from .plans.hints import broadcast_if_small

    docs = load_table(spark, sf_dir, "documents")
    cap = _DF_FRAC * docs.count()
    # Checkpoint the RAW distinct stream (one corpus scan); the capped
    # stream derives from its blocks — the df-count branch and the join
    # branch inside drop_hot_buckets would otherwise each re-scan the
    # corpus during an eager-checkpoint materialization (the q243 lesson).
    sh = _doc_shingles(docs, "text", "doc_id", 3).localCheckpoint(eager=True)
    shc = drop_hot_buckets(sh, ["shingle"], cap).localCheckpoint(eager=True)
    ev = (
        shc.filter(F.col("doc") % _EVAL_MOD == 0)
        .withColumnRenamed("doc", "eval_doc")
    )
    evn = ev.groupBy("eval_doc").agg(F.count("*").alias("_eval_n"))
    shared = (
        shc.join(broadcast_if_small(ev), "shingle")
        .filter(F.col("doc") != F.col("eval_doc"))
        .groupBy("doc", "eval_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )
    return shared.join(broadcast_if_small(evn), "eval_doc").select(
        "doc",
        "eval_doc",
        F.col("n_shared").cast("long").alias("n_shared"),
        (F.col("n_shared") / F.col("_eval_n")).alias("overlap_frac"),
    )


# q233's certified threshold — aliased from the operator layer so the
# cluster_labels default and the oracle SQL share ONE source of truth
# (ADVICE r12 #1).
from .dedup.clusters import JACC_TAU as _JACC_TAU  # noqa: E402

# Shared closure over the df-capped Jaccard graph: capped pairs (q233's
# exact semantics) + recursive-CTE transitive closure (the q64 model) down
# to `comp(doc, cluster)` — used by q250 (histogram) and q254 (split).
_CAPPED_CLOSURE_SQL = f"""{_capped_shingles_cte()},
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM shc GROUP BY doc),
    shared AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS shared
               FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
               GROUP BY 1, 2),
    pairs AS (SELECT s.doc_a AS src, s.doc_b AS dst
              FROM shared s
              JOIN sizes sa ON s.doc_a = sa.doc
              JOIN sizes sb ON s.doc_b = sb.doc
              WHERE CAST(s.shared AS DOUBLE)
                      / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE)
                    >= {_JACC_TAU}),
    sym AS (SELECT src AS u, dst AS v FROM pairs
            UNION SELECT dst, src FROM pairs),
    reach(a, bnode) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.bnode = s.u),
    comp AS (SELECT a AS doc, MIN(bnode) AS cluster FROM reach GROUP BY a)"""


def _capped_jaccard_components(docs: DataFrame) -> DataFrame:
    """``(doc, cluster)`` over the df-capped Jaccard dup graph — q233's
    exact capped pairs at the 0.04 threshold, connected-components labeled
    (min doc id per cluster). Since r12 this delegates to the
    :func:`dedup.clusters.cluster_labels` operator (the standing-artifact
    form a release pipeline materializes ONCE — VERDICT r11 #6); q250
    (histogram), q254 (cluster-wise split), and q255 (the composed release
    report) all consume the same labeling semantics."""
    from .dedup.clusters import cluster_labels

    cap = _DF_FRAC * docs.count()
    return cluster_labels(docs, n=3, threshold=_JACC_TAU, max_shingle_freq=cap)


@query(
    "q250_dup_cluster_stats",
    oracle=f"""
    WITH RECURSIVE {_CAPPED_CLOSURE_SQL},
    csize AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY cluster)
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * cluster_size AS BIGINT) AS docs_total,
           CAST(COUNT(*) * (cluster_size - 1) AS BIGINT) AS docs_removable
    FROM csize GROUP BY cluster_size
    """,
)
def q250_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup report a release pipeline publishes BEFORE cutting docs:
    connected components over the df-capped Jaccard graph (q233's exact
    capped pairs at the same 0.04 threshold), rolled into a cluster-size
    histogram — how many clusters of each size, how many docs they hold,
    and how many are removable (size − 1 per cluster under keep-one
    canonicalization). Singleton docs appear as cluster_size = 1 (the
    honest denominator: removable / total is the corpus dup rate).

    Scale shape: the pair graph is the already-certified capped join
    (posting lists ≤ 2%·N); components run min-label propagation over the
    candidate graph only (O(diameter) rounds, lineage-checkpointed); the
    histogram is two tiny aggregates. The recursive-CTE oracle mirrors
    the same transitive closure (the q64 model)."""
    cc = _capped_jaccard_components(load_table(spark, sf_dir, "documents"))
    csize = cc.groupBy("cluster").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return csize.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters"),
        (F.count("*") * F.col("cluster_size")).cast("long").alias("docs_total"),
        (F.count("*") * (F.col("cluster_size") - 1))
        .cast("long")
        .alias("docs_removable"),
    )


@query(
    "q251_span_savings_by_source",
    oracle=f"""
    WITH {_POS_GRAMS_CTE},
    {_SPANS_SQL},
    src AS (SELECT doc_id, source FROM documents),
    tot AS (SELECT s.source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(d.toks)) AS BIGINT) AS tokens_total
            FROM d JOIN src s USING (doc_id) GROUP BY s.source),
    sp AS (SELECT s.source,
                  CAST(COUNT(DISTINCT sp.doc) AS BIGINT) AS docs_with_spans,
                  CAST(COUNT(*) AS BIGINT) AS n_spans,
                  CAST(SUM(sp.e - sp.s + 1) AS BIGINT) AS tokens_cut
           FROM spans sp JOIN src s ON sp.doc = s.doc_id
           GROUP BY s.source)
    SELECT t.source, t.n_docs,
           COALESCE(sp.docs_with_spans, 0) AS docs_with_spans,
           COALESCE(sp.n_spans, 0) AS n_spans,
           COALESCE(sp.tokens_cut, 0) AS tokens_cut,
           t.tokens_total,
           CAST(COALESCE(sp.tokens_cut, 0) AS DOUBLE)
             / CAST(t.tokens_total AS DOUBLE) AS frac_cut
    FROM tot t LEFT JOIN sp ON t.source = sp.source
    """,
)
def q251_span_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token savings of exact-substring span dedup — which
    sources are bringing copied text, and how much of each source's token
    mass a remove-duplicated-substrings pass (q242) would cut. The sums
    are exact ONLY because q240's spans are token-disjoint since r11
    (overlapping islands merged — ADVICE r10 #3): summing span_tokens
    over overlapping spans would over-count the cut.

    Scale shape: q240's linear span pipeline (one corpus scan,
    checkpointed gram stream) plus one slim (doc_id, source, n_toks)
    metadata pass that feeds both the source attach and the totals —
    checkpointed once, so the query stays at two corpus opens."""
    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicate_spans(docs)
    meta = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("long").alias("_n_toks"),
    ).localCheckpoint(eager=True)  # feeds totals AND the span-source attach
    tot = meta.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_n_toks").cast("long").alias("tokens_total"),
    )
    sp = (
        spans.join(meta, spans["doc"] == meta["doc_id"])
        .groupBy("source")
        .agg(
            F.countDistinct("doc").cast("long").alias("docs_with_spans"),
            F.count("*").cast("long").alias("n_spans"),
            F.sum("span_tokens").cast("long").alias("tokens_cut"),
        )
    )
    zero = F.lit(0).cast("long")
    return tot.join(sp, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("docs_with_spans", zero).alias("docs_with_spans"),
        F.coalesce("n_spans", zero).alias("n_spans"),
        F.coalesce("tokens_cut", zero).alias("tokens_cut"),
        "tokens_total",
        (
            F.coalesce("tokens_cut", zero).cast("double")
            / F.col("tokens_total").cast("double")
        ).alias("frac_cut"),
    )


@query(
    "q252_ivf_cell_stats",
    oracle=f"""
    WITH {_ivf_assign_cte()},
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(COUNT(*) AS DOUBLE) / CAST(tot.n AS DOUBLE) AS load_share
    FROM asg CROSS JOIN tot
    GROUP BY cell, tot.n
    """,
)
def q252_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer health diagnostics: per-cell population and
    load share — the balance check run before deploying an IVF index
    (a degenerate hot cell means probes scan the corpus; the q121
    hot-cluster lesson as a measurable artifact). Exactly oracle-checked:
    cell assignment is the shared md5-seeded sample + quantized-cosine
    argmin CTE the q49 oracle certifies.

    Scale shape: assignment is a pure projection (inlined centroids, zero
    shuffle); the diagnostic is one 16-group aggregate with map-side
    combine — at 100 TB this is the cheapest possible full-corpus pass,
    and the artifact it emits is k rows."""
    from .similarity.ivf import build_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    total = emb.count()
    _centroids, assigned = build_ivf_index(emb, n_cells=16)
    return assigned.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_vectors"),
        (F.count("*").cast("double") / F.lit(float(total))).alias("load_share"),
    )


_BUDGET_PCT = 50  # keep the best docs until 50% of the corpus token mass


def _pct_floor_int64(col: str, pct: int):
    """``floor(col·pct/100)`` in exact int64 arithmetic.

    Spark's ``/`` is IEEE double division — its quotient ulp exceeds 1
    once ``col·pct`` passes 2^53, flipping boundary comparisons vs an
    integer oracle (VERDICT r11 #2). The naive ``col * pct DIV 100`` is
    integral but overflows int64 at ~2^63/pct. The split identity

        floor(t·p/100) = (t div 100)·p + ((t mod 100)·p) div 100

    is exact over the FULL int64 range (first term ≤ t·p/100 + p, second
    ≤ 99·p), so callers inherit 9.2e18-token exactness by construction.
    Property-tested against Python bignum ``//`` at ~1e14–1e18 totals
    (tests/test_round12.py)."""
    return F.expr(f"({col} DIV 100) * {pct} + (({col} % 100) * {pct}) DIV 100")


@query(
    "q253_token_budget_fill",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, n_chars,
                      CAST(len({_TOKS}) AS BIGINT) AS n_toks
               FROM documents),
    tot AS (SELECT SUM(n_toks) AS t FROM d),
    cum AS (SELECT doc_id, source, n_toks,
                   SUM(n_toks) OVER (ORDER BY n_chars DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS c
            FROM d),
    kept AS (SELECT cum.* FROM cum CROSS JOIN tot
             WHERE cum.c <= tot.t * {_BUDGET_PCT} // 100)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS docs_in,
           CAST(SUM(d.n_toks) AS BIGINT) AS tokens_in,
           CAST(COUNT(k.doc_id) AS BIGINT) AS docs_kept,
           CAST(COALESCE(SUM(k.n_toks), 0) AS BIGINT) AS tokens_kept,
           CAST(COALESCE(SUM(k.n_toks), 0) AS DOUBLE)
             / CAST(SUM(d.n_toks) AS DOUBLE) AS kept_token_frac
    FROM d LEFT JOIN kept k ON d.doc_id = k.doc_id
    GROUP BY d.source
    """,
)
def q253_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget fill — the mixture-construction operator: rank
    every document by quality (n_chars DESC, doc_id tiebreak — the q239
    key) and keep documents while the running token total stays within
    the budget (here 50% of the corpus token mass, exact
    integer floor both engines mirror). Reports per source how much of
    its mass survives — the table a data-mixture card publishes.

    Scale shape: NO global window. The running total uses the two-phase
    counting discipline (``operators/scale.py``): per-quality-VALUE token
    sums (map-side combined, |distinct n_chars| rows) give each value's
    starting offset via a window over that tiny rollup; each row's exact
    global cumulative is offset + a within-value running sum (parallel
    across values). Token sums AND the budget threshold stay in int64 —
    the threshold uses the overflow-safe split floor-division identity,
    never double division — exact to 9.2e18 tokens, three orders past
    the 100 TB target (docstring contract, not a decimal cast)."""
    from .functions.text import tokens
    from .plans.hints import broadcast_if_small

    docs = load_table(spark, sf_dir, "documents")
    meta = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(tokens("text")).cast("long").alias("n_toks"),
    ).localCheckpoint(eager=True)  # feeds rollup, per-row cumsum, totals
    per_v = meta.groupBy("n_chars").agg(
        F.sum("n_toks").alias("_vt"),
    )
    wk = Window.orderBy(F.col("n_chars").desc())
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    keys = per_v.select(
        "n_chars",
        (F.sum("_vt").over(wk) - F.col("_vt")).alias("_tstart"),
        F.sum("_vt").over(wall).alias("_t"),
    )
    per_key = Window.partitionBy("n_chars").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = meta.withColumn("_run", F.sum("n_toks").over(per_key)).join(
        broadcast_if_small(keys), "n_chars"
    )
    budget = _pct_floor_int64("_t", _BUDGET_PCT)
    kept = cum.withColumn(
        "_kept", (F.col("_tstart") + F.col("_run")) <= budget
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_in"),
        F.sum("n_toks").cast("long").alias("tokens_in"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0))
        .cast("long")
        .alias("docs_kept"),
        F.sum(F.when(F.col("_kept"), F.col("n_toks")).otherwise(0))
        .cast("long")
        .alias("tokens_kept"),
        (
            F.sum(F.when(F.col("_kept"), F.col("n_toks")).otherwise(0)).cast(
                "double"
            )
            / F.sum("n_toks").cast("double")
        ).alias("kept_token_frac"),
    )


_SPLIT_SALT = 7
_HOLDOUT_MOD = 10  # 1/10 of clusters → holdout


@query(
    "q254_clusterwise_split",
    oracle=f"""
    WITH RECURSIVE {_CAPPED_CLOSURE_SQL}
    SELECT comp.doc, comp.cluster,
           CASE WHEN CAST('0x' || substr(md5('{_SPLIT_SALT}:'
                          || CAST(comp.cluster AS VARCHAR)), 1, 15) AS BIGINT)
                     % {_HOLDOUT_MOD} = 0
                THEN 'holdout' ELSE 'train' END AS split
    FROM comp
    """,
)
def q254_clusterwise_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/holdout split: documents are split by DUP
    CLUSTER, not individually — every member of a near-duplicate cluster
    (q250's df-capped Jaccard components) lands on the same side, so no
    near-duplicate of a holdout document can leak into training (q135's
    doc-hash split cannot guarantee that; this is the split a
    decontaminated eval requires). The assignment hashes the CLUSTER
    label (min doc id — stable under re-runs) with the portable 60-bit
    md5 hash: ~1/10 of clusters → holdout.

    Scale shape: the component labeling is the certified capped-graph
    propagation; the split itself is a pure projection on the label —
    no extra shuffle, and the holdout fraction concentrates around
    1/10 by cluster count (documented bias: it is a
    per-cluster coin, so doc-weighted shares drift with cluster sizes —
    exactly what leakage-safety requires)."""
    from .dedup.minhash import _hash64

    docs = load_table(spark, sf_dir, "documents")
    cc = _capped_jaccard_components(docs)
    split = F.when(
        F.pmod(
            _hash64(F.col("cluster").cast("string"), _SPLIT_SALT),
            F.lit(_HOLDOUT_MOD),
        )
        == 0,
        F.lit("holdout"),
    ).otherwise(F.lit("train"))
    return cc.select("doc", "cluster", split.alias("split"))
