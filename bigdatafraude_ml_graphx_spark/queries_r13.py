"""Round-13 batch: the standing-artifact consumers of the incremental
dedup loop (VERDICT r12 next-round items #2/#7).

- q264: the standing-table consumer — build the bucketed cluster labeling
  ONCE (``cluster_labels(table=...)``) and derive q255's release report
  from the READ-BACK, with the per-cluster aggregation running with zero
  Exchange off the bucketed scan (same oracle as q255: the materialization
  path must not change the answer).
- q265: incremental cluster-label MAINTENANCE — merge today's probe edges
  into yesterday's standing labeling by relabeling ONLY the affected
  components, instead of re-running connected components over the corpus.
- q266: the per-source ingest report — q263's decision table aggregated
  into the accounting a crawl operator reads (docs and tokens kept/dropped
  per source per action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query
from .queries_r10 import _DF_FRAC
from .queries_r11 import _JACC_TAU
from .queries_r12 import (
    _BATCH_MOD,
    _Q255_ORACLE,
    _SPLIT_CASE,
    _ingest_decision_table,
    _q263_oracle,
    _split_col,
)
from .queries_text import _SHINGLES_CTE, _TOKS


@query("q264_standing_labels_report", oracle=_Q255_ORACLE)
def q264_standing_labels_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q255's release report derived through the STANDING-TABLE path: the
    cluster labeling is written once as a managed table bucketed on
    ``cluster`` (``cluster_labels(table=...)``) and the report is computed
    from the read-back frame — the per-cluster count aggregates with ZERO
    Exchange because the bucketed scan already satisfies the hash
    distribution (plan-asserted in tests/test_round13.py). Same oracle as
    q255: materialization strategy must never change the answer.

    This is the production shape the x_cluster_labels_standing_* bench
    rows measure (build ~9 s once at sf0.1, each derived artifact 0.28 s):
    tomorrow's pipeline run READS the labeling instead of re-running
    components, and every downstream artifact (q250's histogram, q254's
    split, this report) is a cheap aggregate over the table. At 100 TB
    the bucketed write amortizes the labeling shuffle once; the 2-key
    report regroup happens on the ≤|clusters| histogram frame, never the
    corpus.

    The table name is uuid-suffixed (the q236 sink convention): a managed
    table's LOCATION outlives the session catalog, so a fixed name
    collides with a previous session's run. The name of the most recent
    build is exposed as ``q264_standing_labels_report.last_table`` for
    the plan test."""
    import uuid

    from .dedup.clusters import cluster_labels

    docs = load_table(spark, sf_dir, "documents")
    cap = _DF_FRAC * docs.count()
    name = f"q264_labels_{uuid.uuid4().hex[:8]}"
    labels = cluster_labels(
        docs, n=3, threshold=_JACC_TAU, max_shingle_freq=cap,
        table=name, num_buckets=16,
    )
    q264_standing_labels_report.last_table = name
    return _labels_report(labels)


def _labels_report(labels: DataFrame) -> DataFrame:
    """q255's report over an existing (doc, cluster) labeling frame —
    shared by the build path (q264) and the plan test's read-back-only
    derive."""
    csize = labels.groupBy("cluster").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    lab = csize.select("cluster_size", _split_col("cluster").alias("split"))
    return lab.groupBy("cluster_size", "split").agg(
        F.count("*").cast("long").alias("n_clusters"),
        (F.count("*") * F.col("cluster_size")).cast("long").alias("docs_total"),
        (F.count("*") * (F.col("cluster_size") - 1))
        .cast("long")
        .alias("docs_removable"),
    )


def _q265_oracle() -> str:
    """Declarative statement of the maintenance semantics: yesterday's
    certified dup graph (base-base pairs, df capped over the BASE corpus —
    the universe the standing labeling was built from) unioned with
    today's new edges (any pair touching a batch doc, df capped over the
    base+batch corpus — what today's run sees after appending the batch),
    transitively closed over all documents. NOTE this is exactly the
    incremental answer, not a full relabel: base-base pairs whose hotness
    flipped when the batch arrived keep yesterday's adjudication (a daily
    loop does not re-pair the corpus to chase cap drift); on corpora where
    no cap flip alters connectivity — including this fixture, pinned in
    tests/test_round13.py — the result equals the full relabel."""
    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    shb AS (SELECT doc, shingle FROM sh WHERE doc % {_BATCH_MOD} != 0),
    keepb AS (SELECT shingle FROM shb GROUP BY shingle
              HAVING COUNT(*) <= {_DF_FRAC} * (SELECT COUNT(*) FROM documents
                                               WHERE doc_id % {_BATCH_MOD} != 0)),
    shcb AS (SELECT shb.doc, shb.shingle FROM shb JOIN keepb USING (shingle)),
    sizb AS (SELECT doc, COUNT(*) AS n_sh FROM shcb GROUP BY doc),
    shrb AS (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS s
             FROM shcb a JOIN shcb b
               ON a.shingle = b.shingle AND a.doc < b.doc
             GROUP BY 1, 2),
    pb AS (SELECT da, db FROM shrb
           JOIN sizb sa ON shrb.da = sa.doc
           JOIN sizb sb ON shrb.db = sb.doc
           WHERE CAST(s AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s AS DOUBLE)
                 >= {_JACC_TAU}),
    keept AS (SELECT shingle FROM sh GROUP BY shingle
              HAVING COUNT(*) <= {_DF_FRAC} * (SELECT COUNT(*) FROM documents)),
    shct AS (SELECT sh.doc, sh.shingle FROM sh JOIN keept USING (shingle)),
    sizt AS (SELECT doc, COUNT(*) AS n_sh FROM shct GROUP BY doc),
    shrt AS (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS s
             FROM shct a JOIN shct b
               ON a.shingle = b.shingle AND a.doc < b.doc
              AND (a.doc % {_BATCH_MOD} = 0 OR b.doc % {_BATCH_MOD} = 0)
             GROUP BY 1, 2),
    pt AS (SELECT da, db FROM shrt
           JOIN sizt sa ON shrt.da = sa.doc
           JOIN sizt sb ON shrt.db = sb.doc
           WHERE CAST(s AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s AS DOUBLE)
                 >= {_JACC_TAU}),
    allp AS (SELECT da, db FROM pb UNION SELECT da, db FROM pt),
    sym AS (SELECT da AS u, db AS v FROM allp
            UNION SELECT db, da FROM allp),
    reach(a, bnode) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.bnode = s.u)
    SELECT a AS doc, MIN(bnode) AS cluster FROM reach GROUP BY a
    """


@query("q265_incremental_cluster_maintenance", oracle=_q265_oracle())
def q265_incremental_cluster_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge today's ingest into the standing near-dup labeling WITHOUT
    relabeling the corpus: the post-ingest ``(doc, cluster)`` for ALL
    documents (base + batch), where component propagation runs only over
    the AFFECTED subgraph — the clusters touched by a new edge, plus the
    batch docs — and every untouched label is carried over by anti join.
    This closes the incremental family's loop: q263 decides keep/drop per
    batch doc; this maintains the labeling those decisions (and q264's
    standing table) come from, at batch-proportional propagation cost.

    Semantics (mirrored exactly by the oracle): yesterday's edges are the
    certified base-universe capped pairs (what the standing labeling was
    built from); today's new edges are batch↔base ∪ batch↔batch under the
    base+batch universe (``ngram_jaccard_probe_pairs(within_probe=True)``).
    Cap drift on base-base pairs keeps yesterday's adjudication — a daily
    loop does not re-pair the corpus; the fixture-pinned property is that
    this equals the full relabel when no cap flip alters connectivity.

    Scale shape: one probe join (batch-proportional) + one star-edge
    extraction over the touched labels; connected components runs on a
    subgraph of size ≈ |batch| + |touched clusters|, NOT |corpus|. The
    untouched majority moves through ONE anti join on the slim labeling.
    The standing labeling is rebuilt in-query per the driver contract;
    production reads it from q264's bucketed table."""
    from .dedup.clusters import cluster_labels
    from .dedup.ngram import ngram_jaccard_probe_pairs
    from .graph.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % _BATCH_MOD == 0
    base = docs.filter(~is_batch)
    batch = docs.filter(is_batch)
    standing = cluster_labels(
        base, n=3, threshold=_JACC_TAU,
        max_shingle_freq=_DF_FRAC * base.count(),
    )
    new_pairs = ngram_jaccard_probe_pairs(
        batch, base, n=3, threshold=_JACC_TAU,
        max_shingle_freq=_DF_FRAC * docs.count(),
        within_probe=True,
    )
    # Affected = clusters containing a base endpoint of any new edge. Tiny
    # by construction (≤ |new pairs|); eager so the aggregate runs once
    # for the semi and anti joins.
    affected = (
        new_pairs.select(F.col("doc_probe").alias("doc"))
        .unionByName(new_pairs.select(F.col("doc_index").alias("doc")))
        .distinct()
        .join(standing, "doc")
        .select("cluster")
        .distinct()
        .localCheckpoint(eager=True)
    )
    touched = standing.join(affected, "cluster", "left_semi")
    untouched = standing.join(affected, "cluster", "left_anti")
    star = touched.filter(F.col("doc") != F.col("cluster")).select(
        F.col("doc").alias("src"), F.col("cluster").alias("dst")
    )
    edges = star.unionByName(
        new_pairs.select(
            F.col("doc_probe").alias("src"), F.col("doc_index").alias("dst")
        )
    )
    verts = touched.select(F.col("doc").alias("id")).unionByName(
        batch.select(F.col("doc_id").alias("id"))
    )
    cc = connected_components(edges, vertices=verts, dedup_edges=False)
    return untouched.select("doc", "cluster").unionByName(
        cc.select(F.col("id").alias("doc"), F.col("component").alias("cluster"))
    )


def _q266_oracle() -> str:
    """q263's decision statement (embedded with its WITH scoped locally)
    joined to the slim per-doc metadata and rolled up per source."""
    return f"""
    WITH dec AS ({_q263_oracle()}),
    meta AS (SELECT doc_id, source,
                    CAST(len({_TOKS}) AS BIGINT) AS n_toks
             FROM documents)
    SELECT m.source, dec.action,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(m.n_toks), 0) AS BIGINT) AS tokens
    FROM dec JOIN meta m ON dec.doc = m.doc_id
    GROUP BY m.source, dec.action
    """


@query("q266_ingest_report_by_source", oracle=_q266_oracle())
def q266_ingest_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest report a crawl operator actually reads: today's batch
    decisions (q263's certified probe — exact dup / near dup / keep)
    aggregated per SOURCE with document and token accounting. A source
    whose batches are mostly drops is re-crawling known content — the
    direct input to crawl-deprioritization (the incremental counterpart
    to q245's whole-corpus source dup rate).

    Scale shape: composes the SAME ``_ingest_decision_table`` lineage as
    q263 (one probe join, batch-proportional) plus one slim (doc_id,
    source, n_toks) projection of the batch rows; the report is a
    |sources|×3-group aggregate with map-side combine."""
    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    dec = _ingest_decision_table(spark, sf_dir)
    meta = docs.filter(F.col("doc_id") % _BATCH_MOD == 0).select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("long").alias("n_toks"),
    )
    j = dec.join(meta, dec["doc"] == meta["doc_id"])
    return j.groupBy("source", "action").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_toks"), F.lit(0).cast("long"))
        .cast("long")
        .alias("tokens"),
    )
