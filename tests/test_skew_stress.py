"""Skew-stress fixture (r7 verdict item 8a): a hot-key lineitem variant
driving the two skew paths the 100 TB story leans on, with PLAN asserts
that the handling actually engages — not just that results are correct.

1. AQE skew-join splitting: the engine's sessions run with
   ``spark.sql.adaptive.skewJoin.enabled`` (session.py); this fixture
   proves the optimization FIRES on a hot key (the executed adaptive
   plan carries ``skew=true`` on the sort-merge join) and that the
   result is identical to the broadcast plan of the same join.

2. Salting (``operators/skew.py``): AQE only splits JOIN partitions, so
   skewed aggregation keys need the explicit two-phase salted rollup.
   The fixture proves the hot key's rows actually spread across
   reducers under the (key, salt) layout — a partition-occupancy
   measurement, not a plan grep — and that the salted result equals the
   plain aggregate exactly.

The hot-key variant remaps ~2/3 of lineitem's order keys onto ONE key —
the "one viral entity" distribution (a bot account, a default value, an
empty document) that breaks naive shuffles at 100 TB.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.operators.skew import salted_agg

SF01 = "/root/testdata/sf0.01"
HOT_KEY = 1


@contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def hot_lineitem(spark):
    """lineitem with ~2/3 of rows remapped onto one hot l_orderkey, padded
    with an incompressible column so the hot shuffle partition crosses the
    (lowered) skew thresholds.

    The repartition(16) is LOAD-BEARING: AQE splits a skewed reduce
    partition at MAPPER-OUTPUT granularity, so a skewed partition fed by
    a single map task (sf0.01 lineitem is one parquet file → one mapper)
    is UNSPLITTABLE and OptimizeSkewedJoin reports zero skewed partitions
    no matter how large it is. On a real cluster the fact arrives from
    thousands of mappers, so the split is always available — the
    repartition reproduces that precondition at test scale. (Found the
    hard way; the rule's DEBUG log showed max 5.6 MB vs median 352 KB yet
    'number of skewed partitions: left 0'.)"""
    li = load_table(spark, SF01, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    return (
        li.withColumn(
            "l_orderkey",
            F.when(F.col("l_orderkey") % 3 != 0, F.lit(HOT_KEY)).otherwise(
                F.col("l_orderkey")
            ),
        )
        .withColumn(
            "_pad",
            F.sha2(
                F.concat(
                    F.col("l_quantity").cast("string"),
                    F.col("l_extendedprice").cast("string"),
                    F.col("l_orderkey").cast("string"),
                ),
                512,
            ),
        )
        .repartition(16)
        .localCheckpoint(eager=True)  # freeze: both joins below reuse it
    )


def test_aqe_skew_join_engages_and_is_correct(spark, hot_lineitem):
    from bigdatafraude_ml_graphx_spark.plans import executed_plan

    orders = load_table(spark, SF01, "orders").select(
        "o_orderkey", "o_orderpriority"
    )

    def run_join():
        # max(_pad) keeps the incompressible column in the join shuffle —
        # column pruning would otherwise shrink the hot partition below
        # the detection threshold.
        return (
            hot_lineitem.join(
                orders, hot_lineitem.l_orderkey == orders.o_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(28,6)"))
                .cast("double")
                .alias("qty"),
                F.max("_pad").alias("pad_probe"),
            )
        )

    # Reference result: the broadcast plan (orders is dim-sized).
    expected = {
        r.o_orderpriority: (r.n, r.qty, r.pad_probe)
        for r in run_join().collect()
    }

    with _confs(
        spark,
        # Force the sort-merge path (what a fact⋈fact join gets at 100 TB)
        # and lower the skew thresholds to test scale.
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        },
    ):
        df = run_join()
        got = {
            r.o_orderpriority: (r.n, r.qty, r.pad_probe)
            for r in df.collect()
        }
        plan = executed_plan(df)

    # The adaptive final plan must show the skew split actually fired.
    assert "skew=true" in plan, plan[:2000]
    assert "isFinalPlan=true" in plan
    assert got == expected


def test_salted_agg_splits_hot_key_across_reducers(spark, hot_lineitem):
    n_hot = hot_lineitem.filter(F.col("l_orderkey") == HOT_KEY).count()
    salt_factor = 16

    # Partition occupancy under the salted layout: the hot key's rows must
    # spread over ~salt_factor reducers instead of landing on one. 3× the
    # ideal share is a generous bound that still fails hard if salting
    # degenerates (all rows on one reducer = n_hot).
    salted = hot_lineitem.withColumn(
        "_salt", (F.rand(42) * salt_factor).cast("int")
    ).repartition(32, "l_orderkey", "_salt")
    occupancy = (
        salted.filter(F.col("l_orderkey") == HOT_KEY)
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    max_rows = max(r.rows for r in occupancy)
    assert len(occupancy) >= salt_factor // 2
    assert max_rows <= 3 * n_hot // salt_factor

    # Contrast: the unsalted layout concentrates the hot key on ONE reducer.
    plain = hot_lineitem.repartition(32, "l_orderkey")
    hot_parts = (
        plain.filter(F.col("l_orderkey") == HOT_KEY)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert hot_parts == 1

    # And the salted rollup is exact: counts equal, decimal sums equal.
    plain_agg = {
        r.l_orderkey: (r.n, r.qty)
        for r in hot_lineitem.groupBy("l_orderkey")
        .agg(
            F.count("l_quantity").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("qty"),
        )
        .collect()
    }
    hot_lineitem_dec = hot_lineitem.withColumn(
        "l_quantity", F.col("l_quantity").cast("decimal(28,6)")
    )
    got = {
        r.l_orderkey: (r.count_l_quantity, r.sum_l_quantity)
        for r in salted_agg(
            hot_lineitem_dec,
            ["l_orderkey"],
            {"l_quantity": "count"},
            salt_factor=salt_factor,
        )
        .join(
            salted_agg(
                hot_lineitem_dec,
                ["l_orderkey"],
                {"l_quantity": "sum"},
                salt_factor=salt_factor,
            ),
            "l_orderkey",
        )
        .collect()
    }
    assert got == plain_agg
