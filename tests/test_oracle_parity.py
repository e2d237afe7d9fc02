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
