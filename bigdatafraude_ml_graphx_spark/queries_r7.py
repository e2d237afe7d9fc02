"""Round-7 batch: BPE merge iteration and SemDeDup embedding-cluster dedup.

Determinism: BPE argmaxes break ties on (count DESC, a, b) string order;
everything else is integer counting over md5-derived keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

# ---------------------------------------------------------------------------
# q186 — BPE merge-pair iteration (tokenizer training primitive)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_oracle(rounds: int) -> str:
    """Unrolled-round oracle (the q149 MATERIALIZED technique): each round
    materializes the pair count, the argmax, and the rewritten vocabulary,
    so DuckDB replays the exact greedy sequence the engine executes."""
    parts = [
        """
    WITH w AS MATERIALIZED (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word),
    c0 AS MATERIALIZED (
      SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS seq, freq
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
      SELECT replace(seq, ' ' || m.a || '  ' || m.b || ' ',
                     ' ' || m.a || m.b || ' ') AS seq, freq
      FROM c{r - 1}, m{r} m)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, a, b, a || b AS merged,"
        f" CAST(cnt AS BIGINT) AS merge_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    parts.append(f"\n    {selects}\n    ORDER BY round")
    return "".join(parts)


@query("q186_bpe_merges", oracle=_bpe_oracle(_BPE_ROUNDS))
def q186_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE merge training over the documents corpus — the one
    LLM-tokenizer primitive the engine lacked (q101 counts bigram
    CANDIDATES; this performs the iterative merges). Trains on the
    distinct-word frequency table (|vocab| rows per round, one corpus
    scan total — the shape that holds at 100 TB); each round's argmax is
    a 1-row bounded collect, and the merge itself is a literal
    double-space ``replace`` whose left-to-right non-overlapping
    semantics are identical in Spark and DuckDB — certified by the
    unrolled MATERIALIZED oracle replaying all {3} rounds."""
    from .functions.bpe import bpe_merges, word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_merges(word_frequencies(docs), _BPE_ROUNDS)
    return spark.createDataFrame(
        merges,
        "round int, a string, b string, merged string, merge_count long",
    ).orderBy("round")


# ---------------------------------------------------------------------------
# q187 — SemDeDup: embedding-cluster semantic dedup (IVF cells + threshold)
# ---------------------------------------------------------------------------

_SEM_K = 16          # deterministic seed centroids (md5 bottom-k sample)
_SEM_THRESHOLD = 0.35  # calibrated: within-cell cosines skew right (cells
# share an argmax direction), so q46's global 0.25 marks ~85% of the sf0.1
# corpus dup; 0.35 measures 10% (sf0.01) / 28% (sf0.1) — a dedup, not a purge
_SEM_CELL_CAP = 1000   # pair-builder cap; inert at test scale
_SEM_DIM = 64


def _sem_qdot(va: str, vb: str) -> str:
    prods = (
        f"[CAST(floor(CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE)"
        f" * 1e12 + 0.5) AS BIGINT) for i in range(1, {_SEM_DIM + 1})]"
    )
    return f"(CAST(CAST(list_sum({prods}) AS BIGINT) AS DOUBLE) / 1e12)"


def _sem_oracle() -> str:
    cos_ec = (
        f"{_sem_qdot('e.embedding', 'c.cvec')}"
        f" / (sqrt({_sem_qdot('e.embedding', 'e.embedding')})"
        f" * sqrt({_sem_qdot('c.cvec', 'c.cvec')}))"
    )
    cos_xy = (
        f"{_sem_qdot('x.embedding', 'y.embedding')}"
        f" / (sqrt({_sem_qdot('x.embedding', 'x.embedding')})"
        f" * sqrt({_sem_qdot('y.embedding', 'y.embedding')}))"
    )
    return f"""
    WITH seed AS MATERIALIZED (
      SELECT vec_id FROM embeddings
      ORDER BY md5('s:' || CAST(vec_id AS VARCHAR)) LIMIT {_SEM_K}),
    cent AS MATERIALIZED (
      SELECT e.vec_id AS cid, e.embedding AS cvec,
             ROW_NUMBER() OVER (ORDER BY e.vec_id) - 1 AS cell
      FROM embeddings e JOIN seed s ON s.vec_id = e.vec_id),
    assign AS MATERIALIZED (
      SELECT vec_id, cell, embedding FROM (
        SELECT e.vec_id, c.cell, e.embedding,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {cos_ec} DESC, c.cell) AS rn
        FROM embeddings e CROSS JOIN cent c) t
      WHERE rn = 1),
    okcell AS (
      SELECT cell FROM assign GROUP BY cell
      HAVING COUNT(*) <= {_SEM_CELL_CAP}),
    a2 AS MATERIALIZED (
      SELECT a.vec_id, a.cell, a.embedding
      FROM assign a JOIN okcell o ON o.cell = a.cell),
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE {cos_xy} >= {_SEM_THRESHOLD})
    SELECT a2.vec_id, CAST(a2.cell AS INT) AS cell, MIN(p.id_a) AS dup_of
    FROM a2 LEFT JOIN pairs p ON p.id_b = a2.vec_id
    GROUP BY a2.vec_id, a2.cell
    """


@query("q187_semdedup", oracle=_sem_oracle())
def q187_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication in embedding
    space — the embedding complement of MinHash/SimHash. Vectors are
    assigned to IVF-style cells (argmax quantized cosine to {16}
    deterministic seed centroids — the md5 bottom-k sample, so the
    partitioner replays in SQL; k-means centroids would be
    engine-specific, the q49/q32 class), pair generation runs ONLY
    within a cell (never O(N²) — the IVF composition VERDICT r6 item 8
    prescribed), hot cells drop via the shared cap discipline, and a
    vector is a duplicate iff a LOWER-ID cellmate sits above the cosine
    threshold — ``dup_of`` = the smallest such id, NULL for kept
    vectors (the keep-one-per-group rule, deterministic by id order).

    Scale shape: centroids broadcast (constant {16} rows — the PQ lesson:
    a broadcast-join codebook frame, never m·k inlined literals, which
    measured compile-bound); assignment is one narrow pass; the
    within-cell self-join is cell-partitioned and capped. Quantized
    int64 dot products (1e12 grid) make every cosine bit-identical to
    the oracle's."""
    from pyspark.sql import Window

    from .operators.skew import drop_hot_buckets
    from .similarity.cosine import _pos_products, _qsum_array

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (
        emb.select(
            "vec_id",
            F.md5(F.concat(F.lit("s:"), F.col("vec_id").cast("string"))).alias("h"),
        )
        .orderBy("h")
        .limit(_SEM_K)
        .select("vec_id")
    )
    cent = (
        emb.join(F.broadcast(seeds), "vec_id")
        .select(F.col("embedding").alias("cvec"), F.col("vec_id").alias("cid"))
        .withColumn(
            "cell", F.row_number().over(Window.orderBy("cid")) - 1
        )  # 16 rows: the single-partition window is bounded by construction
        .drop("cid")
    )

    def _cos(a, b):
        return _qsum_array(_pos_products(a, b)) / (
            F.sqrt(_qsum_array(_pos_products(a, a)))
            * F.sqrt(_qsum_array(_pos_products(b, b)))
        )

    cos_ec = _cos(F.col("embedding"), F.col("cvec"))
    best = (
        emb.crossJoin(F.broadcast(cent))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct((-cos_ec).alias("nc"), F.col("cell").alias("cell"))
            ).alias("m")
        )
        .select("vec_id", F.col("m.cell").alias("cell"))
    )
    assigned = emb.join(best, "vec_id").select("vec_id", "cell", "embedding")
    capped = drop_hot_buckets(assigned, ["cell"], _SEM_CELL_CAP).localCheckpoint(
        eager=True
    )  # pair builder reads it from both sides
    x, y = capped.alias("x"), capped.alias("y")
    cos_xy = _cos(F.col("x.embedding"), F.col("y.embedding"))
    pairs = (
        x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("id_a"),
            F.col("y.vec_id").alias("id_b"),
            cos_xy.alias("cos"),
        )
        .filter(F.col("cos") >= _SEM_THRESHOLD)
    )
    dup = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.min("id_a").alias("dup_of")
    )
    return capped.select("vec_id", F.col("cell").cast("int").alias("cell")).join(
        dup, "vec_id", "left_outer"
    )
