"""Single import point for the full declared query set.

Importing this module triggers registration from every ``queries*`` module;
``QUERIES`` / ``ORACLE`` are the dicts the driver contract exposes.
"""

from __future__ import annotations

from .queries import ORACLE, QUERIES  # noqa: F401  (base relational set)
from . import queries_graph  # noqa: F401  (graph set — registers on import)
from . import queries_text  # noqa: F401  (text/dedup/similarity set)
from . import queries_ml  # noqa: F401  (ML set — rows-only checks)
from . import queries_stream  # noqa: F401  (streaming set)
from . import queries_multimodal  # noqa: F401  (binary-column set)
from . import queries_gaps  # noqa: F401  (windows/cube/time gap coverage)
from . import queries_scalar  # noqa: F401  (scalar fns, distinct counts, G4)
from . import queries_windows2  # noqa: F401  (sliding/session/percentile/sets)
from . import queries_order  # noqa: F401  (order-by-case, coalesce, array idx)
from . import queries_ann  # noqa: F401  (IVF ANN — rows-only)
from . import queries_temporal  # noqa: F401  (as-of/range joins, pivot, explode)
from . import queries_rollup  # noqa: F401  (hierarchical rollup, hash sampling)
from . import queries_sql2  # noqa: F401  (scalar subquery, unpivot — SQL surface)
from . import queries_arrays  # noqa: F401  (higher-order array functions)
from . import queries_windows3  # noqa: F401  (RANGE frames, ntile/first/last)
from . import queries_quality  # noqa: F401  (repetition/chunking/PII/contamination)
from . import queries_cdc  # noqa: F401  (CDC compaction, scalar quantization)
