"""bigdatafraude_ml_graphx_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference repo
``AbbessAhlem/BigDataFraude_ML-GraphX`` (a PySpark fraud-detection pipeline:
SQL analytics, joins, GraphFrames-style graph algorithms, MLlib GBT, and
Structured Streaming) as a clean, general, 100 TB-scalable engine surface —
plus the large-scale training-data-pipeline operators the reference lacks
(dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7.0):
  * DataFrame/SQL first — declare logical plans, let Catalyst/Tungsten pick
    physical strategies (predicate pushdown, column pruning, AQE skew joins).
  * No ``collect()`` in any data path; everything distributed.
  * Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only where
    built-ins genuinely can't express the semantics (vector math, multimodal
    decode).
  * Deterministic under seeds; aggregates over floats are computed via exact
    DECIMAL sums so results are shuffle-order independent.
"""

__version__ = "0.1.0"


def _register_self_contained_kernels() -> None:
    """Ship worker-side kernels by VALUE, not by module reference.

    mapInPandas / pandas_udf closures that touch any module-level name (e.g.
    ``encode_raw8`` inside ``resize_raw8``'s kernel) are serialized by
    cloudpickle with a by-reference import of this package — which fails on
    executors that don't have the repo on PYTHONPATH (any real cluster where
    the driver script added it via ``sys.path`` instead of ``--py-files``).
    Registering the package for pickle-by-value makes every kernel
    self-contained: no deploy-time file shipping needed, and local drivers
    running from any cwd behave like cluster drivers.
    """
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover - older cloudpickle without the API
        pass


_register_self_contained_kernels()

from .session import get_spark  # noqa: E402,F401
from .catalog import TABLES, load_tables, register_views  # noqa: E402,F401
