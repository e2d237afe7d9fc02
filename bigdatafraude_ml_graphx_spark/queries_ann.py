"""IVF ANN query declaration — rows-only check (the nearest-centroid argmax
is not reasonably SQL-expressible; recall vs the exact brute force is pinned
in tests/test_similarity.py instead, the standard ANN validation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query
from .similarity.ivf import build_ivf_index, ivf_topk


@query("q49_ivf_topk")
def q49_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: 16-cell coarse quantizer, 4-probe search — the
    similarity-search scale path (probes shrink the scanned corpus ~4×
    here, ~n_cells/n_probe× in general; at 100 TB the cells are partition
    keys and probes become pruned scans)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assigned = build_ivf_index(emb, n_cells=16)
    return ivf_topk(
        assigned, centroids, emb.filter(F.col("vec_id") < 10), k=5, n_probe=4
    )


_CSCALE = 1_000_000  # 1e-6 quantization — see graph/pagerank.py determinism note


@query(
    "q72_embedding_centroids",
    oracle=f"""
    WITH pe AS (SELECT label, i - 1 AS pos,
                       CAST(embedding[i] AS DOUBLE) AS v
                FROM embeddings,
                     unnest(range(1, len(embedding) + 1)) AS t(i))
    SELECT label, pos,
           CAST(SUM(CAST(floor(v * {_CSCALE} + 0.5) AS BIGINT)) AS DOUBLE)
             / {_CSCALE} / COUNT(*) AS centroid_val,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM pe GROUP BY label, pos
    """,
)
def q72_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, dimension-wise: posexplode → one
    (label, pos) aggregation — the distributed mean-vector shape (class
    prototypes, cluster refinement, drift monitoring). The shuffle carries
    |labels|·dim partial sums, independent of corpus size; sums are
    quantized-int64 so results are bit-identical across partitionings and
    engines (double sums are not — see graph/pagerank.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    return pe.groupBy("label", F.col("pos").cast("long").alias("pos")).agg(
        (
            F.sum(F.floor(F.col("v") * _CSCALE + F.lit(0.5)).cast("long")).cast(
                "double"
            )
            / _CSCALE
            / F.count("*")
        ).alias("centroid_val"),
        F.count("*").alias("n_vectors"),
    )
