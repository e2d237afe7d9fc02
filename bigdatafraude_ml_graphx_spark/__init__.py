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

from .session import get_spark  # noqa: F401
from .catalog import TABLES, load_tables, register_views  # noqa: F401
