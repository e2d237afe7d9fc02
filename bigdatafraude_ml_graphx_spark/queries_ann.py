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
