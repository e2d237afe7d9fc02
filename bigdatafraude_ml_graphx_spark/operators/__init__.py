from .relational import (  # noqa: F401
    null_census,
    bucketize,
    describe_stats,
    top_k,
    top_k_per_group,
    dedup_rows,
    agg_by,
)
