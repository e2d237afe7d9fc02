from .relational import (  # noqa: F401
    null_census,
    bucketize,
    describe_stats,
    top_k,
    top_k_per_group,
    dedup_rows,
    agg_by,
)
from .temporal import asof_join, range_join, bucketed_interval_join  # noqa: F401
from .rollup import hierarchical_rollup  # noqa: F401
from .sampling import (  # noqa: F401
    hash_sample,
    stratified_hash_sample,
    weighted_sample_topk,
)
from .skew import salted_agg, salted_join  # noqa: F401
from .cdc import latest_by_key, snapshot_diff  # noqa: F401
from .chunking import chunk_documents, pack_chunks  # noqa: F401
