"""Every declared query with an oracle must match DuckDB exactly (the local
mirror of the driver's CORRECTNESS gate, see tests/oracle_harness.py)."""

from __future__ import annotations

import pytest

from bigdatafraude_ml_graphx_spark import registry as q

from .oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(q.ORACLE))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = q.QUERIES[name](spark, sf_dir)
    compare(df, con, q.ORACLE[name], name)


def test_all_queries_run(spark, sf_dir):
    for name, fn in q.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_no_query_plan_uses_row_at_a_time_python(spark, sf_dir):
    """Global stay-JVM-side contract: no declared query's optimized plan
    may contain a ``BatchEvalPython`` node (a row-at-a-time Python UDF —
    the ~10-100x-slower path SURVEY §4 bans from hot paths). Arrow-batched
    nodes (``ArrowEvalPython``, ``FlatMapGroupsInPandas``, ``MapInPandas``,
    ``FlatMapGroupsInPandasWithState``) remain the sanctioned vectorized
    escape hatch for genuinely non-relational kernels (multimodal decode,
    stateful streaming, the Python DataSource) and are not restricted
    here. The repo currently has ZERO ``F.udf`` call sites; this sweep
    keeps it that way as a tested contract rather than a convention."""
    from bigdatafraude_ml_graphx_spark.plans import formatted_plan

    offenders = []
    for name, fn in q.QUERIES.items():
        if "BatchEvalPython" in formatted_plan(fn(spark, sf_dir)):
            offenders.append(name)
    assert offenders == []
