from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatafraude_ml_graphx_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/spark_graft_warehouse",
            # The scan-replay budget gate (tests/test_replay_budgets.py)
            # reads the UI REST SQL metrics — keep the UI on in tests.
            "spark.ui.enabled": "true",
            "spark.ui.retainedExecutions": "5000",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
