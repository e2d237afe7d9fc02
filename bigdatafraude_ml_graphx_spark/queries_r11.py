"""Round-11 batch: closing the VERDICT r10 watch items.

- q249: df-capped contamination sweep — q70's benchmark-overlap check in
  the boilerplate-safe production config (q233's 2%-of-corpus cap applied
  to the contamination join), bounding the one adversary-sensitive query
  left in the hot-content sweep (q70: 50.9× answer growth under the
  hot-CONTENT fixture because every doc "contaminates" every eval doc
  through the shared boilerplate block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query
from .queries_r10 import _DF_FRAC
from .queries_text import _SHINGLES_CTE

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
    stream (eval ⊆ corpus, so no second tokenize pass) and broadcasts;
    posting lists are bounded at 2%·N before the join, so the join output
    per shingle is ≤ 0.02·N·|eval docs sharing it| — never the B² of the
    uncapped adversary case."""
    from .dedup.ngram import _doc_shingles
    from .operators.skew import drop_hot_buckets

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
        shc.join(F.broadcast(ev), "shingle")
        .filter(F.col("doc") != F.col("eval_doc"))
        .groupBy("doc", "eval_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )
    return shared.join(F.broadcast(evn), "eval_doc").select(
        "doc",
        "eval_doc",
        F.col("n_shared").cast("long").alias("n_shared"),
        (F.col("n_shared") / F.col("_eval_n")).alias("overlap_frac"),
    )
