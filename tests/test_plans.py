"""Plan-shape assertions: the properties that survive a 100× scale-up.

Wall-clock at sf0.001 proves nothing about 100 TB; these tests pin the
physical-plan characteristics that do: predicate pushdown into the parquet
scan, column pruning, broadcast joins for dimensions, TakeOrderedAndProject
for top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark import registry as q
from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.plans import (
    has_pushed_filters,
    scan_read_schema,
    uses_broadcast_join,
    uses_take_ordered,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = q.QUERIES["q04_revenue_filter"](spark, sf_dir)
    assert has_pushed_filters(df)


def test_column_pruning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    read = scan_read_schema(df)
    assert set(read) == {"l_orderkey", "l_quantity"}  # 2 of 11 columns read


def test_flagship_prunes_to_needed_columns(spark, sf_dir):
    df = q.QUERIES["q01_pricing_summary"](spark, sf_dir)
    read = set(scan_read_schema(df))
    assert read == {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }


def test_dimension_joins_broadcast(spark, sf_dir):
    df = q.QUERIES["q12_nation_revenue"](spark, sf_dir)
    assert uses_broadcast_join(df)


def test_topk_avoids_full_sort(spark, sf_dir):
    df = q.QUERIES["q02_top10_orders"](spark, sf_dir)
    assert uses_take_ordered(df)


def test_shipdate_filter_pushdown(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey")
    assert has_pushed_filters(df)


def test_sql_surface_equivalence(spark, sf_dir):
    """Dual surface (SURVEY §3.2): every capability reachable from spark.sql
    over registered views, producing identical results to the DataFrame API."""
    from bigdatafraude_ml_graphx_spark.catalog import register_views

    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS num_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
    via_df = (
        q.QUERIES["q08_segment_revenue"](spark, sf_dir)
        .select("c_mktsegment", "num_orders")
    )
    assert {tuple(r) for r in via_sql.collect()} == {
        tuple(r) for r in via_df.collect()
    }


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Identically-bucketed tables join with ZERO Exchange nodes — the
    write-once-shuffle-never co-location contract."""
    from bigdatafraude_ml_graphx_spark.plans import formatted_plan
    from bigdatafraude_ml_graphx_spark.sources.io import write_bucketed_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed_table(
        orders, "b_orders", ("o_custkey",), num_buckets=4, sort_cols=("o_custkey",)
    )
    write_bucketed_table(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", ("o_custkey",), num_buckets=4, sort_cols=("o_custkey",),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_windows_share_one_exchange(spark, sf_dir):
    """q61's two frames partition+order identically — the plan must shuffle
    once, not once per window."""
    from bigdatafraude_ml_graphx_spark import registry as q

    df = q.QUERIES["q61_ntile_first_last"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_explode_runs_before_shuffle(spark, sf_dir):
    """q53: the generator (explode) must sit below the aggregation exchange —
    tokens are produced partition-locally, only (token) pairs move."""
    from bigdatafraude_ml_graphx_spark import registry as q

    df = q.QUERIES["q53_token_explode"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    gen = plan.find("Generate")
    exch = plan.find("Exchange")
    assert gen != -1 and exch != -1
    # executedPlan prints top-down: Exchange (later stage) appears BEFORE the
    # Generate feeding it, so pushdown means Generate at a LARGER offset
    assert gen > exch, plan


def test_range_frame_single_window_pass(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark import registry as q

    df = q.QUERIES["q60_range_frame_trailing_sum"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1, plan


def test_q62_shuffle_join_and_topk(spark, sf_dir):
    """The large-fact join must be a real shuffle join path (no nested loop)
    and the final top-10 a TakeOrderedAndProject, not a global sort."""
    from bigdatafraude_ml_graphx_spark import registry as q
    from bigdatafraude_ml_graphx_spark.plans.inspect import uses_take_ordered

    df = q.QUERIES["q62_shipping_priority"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert uses_take_ordered(df), plan


def test_q63_exists_decorrelates_to_semi_join(spark, sf_dir):
    """The correlated EXISTS must become a semi join (one pass per table),
    never a nested-loop per-row subquery."""
    from bigdatafraude_ml_graphx_spark import registry as q

    df = q.QUERIES["q63_exists_late_orders"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A partitioned fact joined to a selectively-filtered dimension must
    prune partitions at RUNTIME via a dynamic-pruning subquery — at 100 TB
    this is the difference between scanning 5 partitions and scanning one."""
    from bigdatafraude_ml_graphx_spark.sources.io import write_parquet

    fact = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_priority")
    write_parquet(fact, path, partition_by=("o_orderpriority",))

    dim = (
        fact.select("o_orderpriority")
        .distinct()
        .withColumn("urgent", F.col("o_orderpriority").startswith("1"))
    )
    joined = (
        spark.read.parquet(path)
        .join(F.broadcast(dim.filter(F.col("urgent"))), "o_orderpriority")
        .groupBy("o_orderpriority")
        .count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_ivf_bucketed_probe_no_corpus_exchange(spark, sf_dir):
    """The IVF docstring commits to a bucketed-by-cell corpus at 100 TB; this
    proves that layout: the probe join re-shuffles ONLY the (tiny) probe
    side — the corpus scan is bucketed and Exchange-free."""
    from bigdatafraude_ml_graphx_spark.plans import formatted_plan
    from bigdatafraude_ml_graphx_spark.similarity.ivf import build_ivf_index
    from bigdatafraude_ml_graphx_spark.sources.io import write_bucketed_table

    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = build_ivf_index(emb, n_cells=8)
    write_bucketed_table(
        assigned, "t_ivf_corpus", ("cell",), num_buckets=8, sort_cols=("cell",)
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probes = spark.createDataFrame(
            [(i, i % 8) for i in range(5)], "query_id long, cell long"
        )
        joined = spark.table("t_ivf_corpus").join(probes, "cell")
        plan = formatted_plan(joined)
        import re

        # formatted mode prints each node in the tree AND a detail block —
        # count the detail headers, one per physical Exchange node
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_ivf_corpus")


def test_minhash_agg_no_exchange_on_bucketed_docs(spark, sf_dir):
    """Documents bucketed by doc_id: the MinHash signature aggregation
    (groupBy doc) reuses the bucket partitioning THROUGH the shingle explode
    — zero Exchange in the whole signature plan. At 100 TB this removes the
    |docs|·k-longs shuffle entirely."""
    from bigdatafraude_ml_graphx_spark.dedup.minhash import minhash_signatures
    from bigdatafraude_ml_graphx_spark.plans import formatted_plan
    from bigdatafraude_ml_graphx_spark.sources.io import write_bucketed_table

    docs = load_table(spark, sf_dir, "documents")
    write_bucketed_table(docs, "t_docs_b", ("doc_id",), num_buckets=8)
    try:
        sigs = minhash_signatures(spark.table("t_docs_b"), num_hashes=8)
        plan = formatted_plan(sigs)
        assert "Exchange" not in plan, plan
        # and the result is identical to the unbucketed computation
        base = minhash_signatures(docs, num_hashes=8)
        assert sigs.exceptAll(base).count() == 0
        assert sigs.count() == base.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")


def test_ivf_build_assignment_no_exchange(spark, sf_dir):
    """Nearest-centroid assignment is a pure projection (inlined-literal
    centroids + per-row argmax): the plan must contain no Exchange, no
    Window, no join — the corpus never shuffles during index build."""
    from bigdatafraude_ml_graphx_spark.plans import formatted_plan
    from bigdatafraude_ml_graphx_spark.similarity.ivf import build_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = build_ivf_index(emb, n_cells=8)
    plan = formatted_plan(assigned)
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    # every vector gets exactly one cell, all cells within range
    from pyspark.sql import functions as F

    stats = assigned.agg(
        F.count("*").alias("n"),
        F.countDistinct("id").alias("n_ids"),
        F.min("cell").alias("mn"),
        F.max("cell").alias("mx"),
    ).collect()[0]
    assert stats["n"] == stats["n_ids"]
    assert 0 <= stats["mn"] and stats["mx"] <= 7


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime bloom-filter injection (the AQE-era semi-join reduction): a
    selective filter on the orders side of lineitem⋈orders plants a
    bloom_filter_agg on the creation side and a might_contain probe above
    the lineitem scan — at 100 TB this drops most fact rows BEFORE the
    shuffle. Results must be identical with and without the filter."""
    saved = {}
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, opt
        assert "might_contain" in opt, opt
        with_bloom = {(r["o_orderpriority"], r["n"]) for r in j.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j2 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert {(r["o_orderpriority"], r["n"]) for r in j2.collect()} == with_bloom


def test_q92_single_fact_shuffle_all_dims_broadcast(spark, sf_dir):
    """The Q7-shape nation-pair join plans every dimension as a broadcast:
    the only hash Exchange is the final aggregation — the fact side never
    shuffles for a join at this scale."""
    import re

    df = q.QUERIES["q92_nation_pair_volume"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert len(hash_exchanges) == 1, plan
    assert plan.count("BroadcastExchange") >= 3, plan


def test_topk_new_queries_avoid_full_sort(spark, sf_dir):
    """q94 (top-20 customers) and q101 (top-50 bigrams) compile their
    ORDER BY + LIMIT to TakeOrderedAndProject — no global sort of the
    aggregate output."""
    for name in ("q94_returned_item_customers", "q101_bigram_vocab"):
        df = q.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, (name, plan)


def test_winnow_single_exchange(spark, sf_dir):
    """Winnowing fingerprints: gram hashing is a pure projection; the plan
    holds exactly one hash Exchange (the per-document window/distinct key)."""
    import re

    df = q.QUERIES["q100_winnow_fingerprints"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_broadcast_if_small_applies_and_withholds_hint(spark, sf_dir):
    """Size-guarded hint: hinted under the byte budget, unhinted above it
    (where the static planner falls back and AQE decides at runtime)."""
    from bigdatafraude_ml_graphx_spark.plans.hints import (
        broadcast_if_small,
        parse_byte_conf,
        plan_size_bytes,
    )

    assert parse_byte_conf("10485760b") == 10 << 20
    assert parse_byte_conf("10MB") == 10 << 20
    assert parse_byte_conf("-1") == -1
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    assert plan_size_bytes(n) > 0
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = c.join(
            broadcast_if_small(n, max_bytes=10 << 20),
            c.c_nationkey == n.n_nationkey,
        )
        plan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan, plan
        # over-budget (or broadcast disabled): no hint, no broadcast
        for guarded in (
            broadcast_if_small(n, max_bytes=16),
            broadcast_if_small(n),  # session threshold -1 -> never hint
        ):
            unhinted = c.join(guarded, c.c_nationkey == n.n_nationkey)
            plan = unhinted._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def _plan_subtrees(plan: str, needle: str) -> list[str]:
    """Text of each subtree rooted at a node matching ``needle`` in a
    physical-plan treeString (children = subsequent lines with strictly
    deeper indentation)."""
    lines = plan.splitlines()
    subtrees = []
    for i, line in enumerate(lines):
        if needle not in line:
            continue
        depth = len(line) - len(line.lstrip(" :+-*"))
        body = [line]
        for nxt in lines[i + 1:]:
            nd = len(nxt) - len(nxt.lstrip(" :+-*"))
            if nxt.strip() and nd <= depth:
                break
            body.append(nxt)
        subtrees.append("\n".join(body))
    return subtrees


def _broadcast_subtrees(plan: str) -> list[str]:
    return _plan_subtrees(plan, "BroadcastExchange")


def test_q94_broadcasts_topk_not_customer(spark, sf_dir):
    """q94 re-attaches customer attributes by broadcasting the 20-row
    top-k side; the linearly-growing customer scan must never sit under a
    BroadcastExchange (VERDICT r4 item 2)."""
    df = q.QUERIES["q94_returned_item_customers"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    subtrees = _broadcast_subtrees(plan)
    assert subtrees, plan  # nation + top-k side broadcast
    offenders = [s for s in subtrees if "customer" in s]
    assert not offenders, offenders


def test_distributed_variants_globalize_only_aggregates(spark, sf_dir):
    """q126/q128 replace the serial global row window: any SinglePartition
    exchange in their plans sits above an aggregate summary (counts /
    per-bucket rollup), never above raw scanned rows. The serial q104
    deliberately violates this (its NTILE globalizes the row stream) —
    asserted too, so this test keeps discriminating."""

    def single_partition_subtrees(plan):
        return _plan_subtrees(plan, "Exchange SinglePartition")

    for name in ("q126_max_concurrency_scaled", "q128_length_deciles_scaled"):
        plan = q.QUERIES[name](spark, sf_dir)._jdf.queryExecution(
        ).executedPlan().toString()
        subs = single_partition_subtrees(plan)
        assert subs, plan  # the tiny summary window still globalizes
        for s in subs:
            assert "HashAggregate" in s, (name, s)
    serial = q.QUERIES["q104_length_deciles"](spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    raw_global = [
        s for s in single_partition_subtrees(serial)
        if "HashAggregate" not in s
    ]
    assert raw_global, serial  # q104's global row window is the contrast


def test_round5_new_query_plan_shapes(spark, sf_dir):
    """q129's ship-year filter reaches the lineitem scan; q131's top-k
    compiles to TakeOrderedAndProject (no global sort)."""
    from bigdatafraude_ml_graphx_spark.plans.inspect import (
        has_pushed_filters,
        uses_take_ordered,
    )

    assert has_pushed_filters(q.QUERIES["q129_priority_by_linestatus"](spark, sf_dir))
    assert uses_take_ordered(q.QUERIES["q131_waiting_orders"](spark, sf_dir))


def test_rank_limit_pushdown_for_topk_windows(spark, sf_dir):
    """Top-k-per-group windows must compile to WindowGroupLimit (Spark
    3.5+ rank-limit pushdown): each group keeps a k-row heap instead of a
    full per-group sort — the property that keeps these windows viable at
    100× group sizes. Pinning the node turns an optimizer assumption into
    a tested contract (VERDICT r5 item 5). Intentionally absent: q107
    (max-over-struct aggregate, no window at all) and q141 (its
    count(*)-over-group window must see every row — the pushdown cannot
    and should not fire; the window is bounded by dup-group size)."""
    from bigdatafraude_ml_graphx_spark.plans import uses_window_group_limit

    for name in (
        "q13_top3_orders_per_customer",
        "q147_ordered_string_agg",
    ):
        assert uses_window_group_limit(q.QUERIES[name](spark, sf_dir)), name


def test_round6_topk_shapes_compile_to_take_ordered(spark, sf_dir):
    """The round-6 bounded-cut queries must never global-sort: the Q2
    argmin output cut (q152), the Q11 important-parts cut (q153), the
    Zipf vocabulary cut (q157), the KMV bottom-k (q158), and the OOV
    vocabulary cut (q166) all compile to TakeOrderedAndProject."""
    for name in (
        "q152_min_cost_supplier",
        "q153_important_part_values",
        "q157_zipf_slope",
        "q158_kmv_distinct",
        "q166_oov_rate",
    ):
        assert uses_take_ordered(q.QUERIES[name](spark, sf_dir)), name
    # and the Q2 shape broadcasts its dimension chain
    assert uses_broadcast_join(q.QUERIES["q152_min_cost_supplier"](spark, sf_dir))


def test_guarded_queries_correct_without_any_broadcast(spark, sf_dir):
    """With broadcasting disabled session-wide, every size-guarded query
    must plan shuffle joins (no hint escapes the guard) and produce
    value-identical results — the 'plans differ, answers don't' contract
    behind broadcast_if_small."""
    names = (
        "q89_regional_supplier_volume",
        "q94_returned_item_customers",
        "q96_small_quantity_revenue",
        "q97_large_volume_orders",
    )
    baseline = {
        n: sorted(map(tuple, q.QUERIES[n](spark, sf_dir).collect()))
        for n in names
    }
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for n in names:
            df = q.QUERIES[n](spark, sf_dir)
            rows = sorted(map(tuple, df.collect()))
            assert rows == baseline[n], n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_iterative_and_recursive_plans_never_rescan_base_relations(
    spark, sf_dir
):
    """Scan-replay contract for every iterative family (VERDICT r6 items
    1 and 6): the returned frame's optimized plan must contain ZERO
    parquet scans — the edge/frontier/state frames live in
    localCheckpoint-ed blocks, so neither the recursion (q173, which
    previously scanned events 8× via CTE inlining) nor any DataFrame
    fixpoint loop (q175 relaxation, q162 rank iteration, q180 peeling)
    re-reads base relations per iteration."""
    from bigdatafraude_ml_graphx_spark.plans import parquet_scan_count

    for name in (
        "q173_recursive_reachability",
        "q175_dag_levels",
        "q162_personalized_pagerank",
        "q180_ktruss",
    ):
        df = q.QUERIES[name](spark, sf_dir)
        assert parquet_scan_count(df) == 0, name


def test_round7_shapes(spark, sf_dir):
    """Round-7 plan contracts: the basket and CMS top-k cuts compile to
    TakeOrderedAndProject, the RANK-with-ties window gets the
    WindowGroupLimit pushdown (the pushdown covers rank-like functions,
    not just row_number), and the RI audit broadcasts its parent keys."""
    from bigdatafraude_ml_graphx_spark.plans import uses_window_group_limit

    assert uses_take_ordered(q.QUERIES["q188_market_basket"](spark, sf_dir))
    assert uses_take_ordered(q.QUERIES["q190_countmin_sketch"](spark, sf_dir))
    assert uses_window_group_limit(
        q.QUERIES["q206_topk_with_ties"](spark, sf_dir)
    )
    assert uses_broadcast_join(
        q.QUERIES["q189_referential_integrity"](spark, sf_dir)
    )


def test_round7_single_scan_contracts(spark, sf_dir):
    """Single-scan plan contracts for the session-3 rewrites.

    q189: the RI audit probes all of lineitem's outgoing FK edges in ONE
    pass over the child — the plan holds exactly 8 physical parquet scans
    (lineitem + 3 key-only parents, orders + customer for the o_custkey
    edge, customer + nation for the c_nationkey edge). parquet_scan_count
    matches ``Scan parquet`` in the formatted plan, which lists every
    node twice (tree + details), so 8 physical ⇔ 16. The pre-rewrite
    per-edge anti-join plan measured 30 (15 physical — lineitem alone
    re-scanned 6×).

    q221: the RFM rollup and the first two scoring passes localCheckpoint,
    so the final plan reads checkpointed blocks only — zero parquet scans
    (distributed_ntile consumes its input twice; three chained bare passes
    re-executed the orders rollup 2^3 times)."""
    from bigdatafraude_ml_graphx_spark.plans import parquet_scan_count

    ri = q.QUERIES["q189_referential_integrity"](spark, sf_dir)
    assert parquet_scan_count(ri) == 16  # 8 physical scans, one per role

    rfm = q.QUERIES["q221_rfm_segments"](spark, sf_dir)
    assert parquet_scan_count(rfm) == 0

    # q150: the strong-tie edge list checkpoints once, so the wedge-join
    # edge build no longer replays per consumer (was 6 events scans).
    assert (
        parquet_scan_count(
            q.QUERIES["q150_degree_assortativity"](spark, sf_dir)
        )
        == 0
    )

    # q144: the checkpointed med frame stops the first median pass from
    # replaying inside the deviation/final joins — exactly one lineitem
    # scan survives (the MAD level; the fact projection is deliberately
    # NOT checkpointed, so the scan itself remains).
    assert (
        parquet_scan_count(q.QUERIES["q144_mad_robust_stats"](spark, sf_dir))
        == 2  # 1 physical scan (formatted plan lists tree + details)
    )


def test_round7_session3_scan_budgets(spark, sf_dir):
    """Scan budgets for the session-3 replay fixes (physical scans =
    ``parquet_scan_count`` // 2 — the formatted plan lists each node in
    tree + details). Each query's shared intermediate (distinct basket
    frame, hour×type presence set, per-doc token stats, vocab rollups,
    category rollup) now localCheckpoints, so the final plan reads
    checkpointed blocks — bare, every consumer replayed the fact scan
    and its shuffle (counts measured before the fix in parentheses).
    q213/q214 keep ONE live scan: the second corpus pass that joins the
    broadcast ratio table is genuine streaming work, not a replay."""
    from bigdatafraude_ml_graphx_spark.plans import parquet_scan_count

    budgets = {
        "q188_market_basket": 0,       # was 4 lineitem scans
        "q200_time_gap_detection": 0,  # was 3 events scans
        "q210_bm25_ranking": 0,        # was 4 documents scans
        "q197_vocab_coverage": 0,      # was 3 documents scans
        "q226_target_encoding": 0,     # was 2 orders + 2 customer scans
        "q213_perplexity_filter": 1,   # was 3 documents scans
        "q214_dsir_weights": 1,        # was 5 documents scans
        # The two heaviest graph queries of the round: everything reads
        # the checkpointed edge list / LPA labels — zero live scans.
        "q209_graph_modularity": 0,
        "q194_graph_eccentricity": 0,
    }
    for name, physical in budgets.items():
        df = q.QUERIES[name](spark, sf_dir)
        assert parquet_scan_count(df) == 2 * physical, name


def test_round7_batch2_shapes(spark, sf_dir):
    """Round-7 batch-2+ plan contracts: the DSIR and TextRank top-n cuts
    compile to TakeOrderedAndProject (never a global sort); the Pareto
    crossing's LIMIT 1 likewise; the iterative/checkpointed frames
    (k-means rounds, TextRank's PageRank loop) contain ZERO parquet
    scans in their final plans — the same no-rescan discipline as
    q162/q175/q180; and the z-order Morton fold stays JVM-side (no
    Python evaluation node in the plan)."""
    from bigdatafraude_ml_graphx_spark.plans import (
        formatted_plan,
        parquet_scan_count,
    )

    assert uses_take_ordered(q.QUERIES["q214_dsir_weights"](spark, sf_dir))
    assert uses_take_ordered(q.QUERIES["q222_pareto_coverage"](spark, sf_dir))

    tr = q.QUERIES["q228_textrank_keywords"](spark, sf_dir)
    assert uses_take_ordered(tr)
    assert parquet_scan_count(tr) == 0  # ranks live in checkpointed blocks

    km = q.QUERIES["q225_kmeans_lloyd"](spark, sf_dir)
    assert parquet_scan_count(km) == 0  # rounds read the checkpointed grid

    zo = q.QUERIES["q217_zorder_keys"](spark, sf_dir)
    assert "BatchEvalPython" not in formatted_plan(zo)
    assert "ArrowEvalPython" not in formatted_plan(zo)


def test_round7_mode_prunes_join_columns(spark, sf_dir):
    """q223's mode rollup must read only the two needed columns from each
    side — the pruning that keeps the fact join narrow at 100 TB."""
    from bigdatafraude_ml_graphx_spark.plans import formatted_plan
    import re

    df = q.QUERIES["q223_group_mode"](spark, sf_dir)
    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for s in schemas for c in s.split(",") if c}
    assert cols == {
        "l_orderkey",
        "l_returnflag",
        "o_orderkey",
        "o_orderpriority",
    }


def test_round8_checkpoint_scan_budgets(spark, sf_dir):
    """Round-8 replay fixes (VERDICT r7 items 2-3), pinned as plan budgets
    (physical scans = ``parquet_scan_count`` // 2 — tree + details).

    q172: the 1% query-sample frame localCheckpoints once, so the four
    consumers (ADC shortlist, exact rerank, exact top-k, n_queries agg)
    read checkpointed blocks instead of re-scanning embeddings through a
    non-prunable %-filter (replay audit: 9 opens → 5; the surviving opens
    are the construction-time codebook/encode/exact passes plus the ONE
    live raw-vector scan the rerank keeps in the final plan — the exact
    side checkpoints at construction).

    q15: big/building each feed union+intersect+except; bare, each
    consumption replayed the orders rollup / customer filter (4 opens →
    2). Both frames checkpoint, so the final plan has zero live scans."""
    from bigdatafraude_ml_graphx_spark.plans import parquet_scan_count

    pq = q.QUERIES["q172_pq_recall_contract"](spark, sf_dir)
    assert parquet_scan_count(pq) == 2 * 1  # the rerank's raw-vector pass

    se = q.QUERIES["q15_set_union_except"](spark, sf_dir)
    assert parquet_scan_count(se) == 0


def test_round8_replay_adjudication_budgets(spark, sf_dir):
    """Round-8 replay-candidate adjudications (VERDICT r7 item 4), pinned
    as final-plan budgets (physical scans = ``parquet_scan_count`` // 2).
    Replay-audit opens before → after each fix:

    * q108 4→1: the dim snapshot checkpoints once (was 4 same-column
      customer scans — target + three derived CDC branches).
    * q120 4→1: one-pass multiplicity aggregate replaces the four-scan
      exceptAll/intersectAll formulation; exactly one lineitem scan.
    * q162 4→2: personalized_pagerank checkpoints the seed set (was
      consumed 3× — vertex union, teleport join, |S| count — each
      replaying an events scan). Final plan: zero live scans (edge list
      and ranks live in checkpointed blocks).
    * q103 4→1: the signature frame's lazy persist raced its parallel
      consumer stages; eager checkpoint = one guaranteed scan. Final
      plan: zero (result frame is itself checkpointed).
    * q124 3→2: mixture_sample checkpoints the group-counts frame (the
      min side replayed the rollup); the one live scan is the corpus
      pass the sample filter runs over.
    * q70 3→2: the eval shingle frame checkpoints (the sizes aggregate
      replayed the eval scan); the one live scan is the corpus side.

    Adjudicated LEGITIMATE, no fix (documented in COVERAGE.md): q48
    (3 opens = 3 distinct tables), q84 (3× same-column scan of a pruned
    FACT — re-scan beats materializing, the q144 rule), q67/q134
    (distinct aggregation passes — unigram/bigram/lengths — sharing only
    the tokenize; exchange reuse already dedups repeated subplans), q141
    (disjoint-column scans: text for signatures, ids for vertices,
    n_chars for the argmax — the q199/q227 columnar rule)."""
    from bigdatafraude_ml_graphx_spark.plans import parquet_scan_count

    budgets = {
        "q108_merge_upsert": 0,
        "q120_multiset_ops": 1,
        "q162_personalized_pagerank": 0,
        "q103_srp_near_pairs": 0,
        "q124_corpus_mixture": 1,
        "q70_contamination_overlap": 1,
    }
    for name, physical in budgets.items():
        df = q.QUERIES[name](spark, sf_dir)
        assert parquet_scan_count(df) == 2 * physical, name


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Runtime bloom-filter join pushdown (r9): when a shuffle join's
    build side is selective, Spark injects a bloom filter onto the probe
    side's scan (`might_contain`), cutting the shuffled fact volume — a
    first-order lever at 100 TB. The session enables it
    (spark.sql.optimizer.runtime.bloomFilter.enabled=true, verified
    here); the size thresholds (10 GB probe-side scan by default) are
    relaxed to test scale ONLY to prove the injection machinery engages —
    at production scale the defaults pass on their own. Broadcast is
    disabled so the join actually shuffles (a broadcast join gets DPP-
    style filtering for free instead)."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .filter(F.col("o_totalprice") > 200000)
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "might_contain" in plan, "bloom filter not injected"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_round10_new_query_plan_shapes(spark, sf_dir):
    """Round-10 batch 2/3 plan contracts: the quota (q239), the kNN top-k
    (q246), and the curation pipeline's quota stage (q247) all compile to
    WindowGroupLimit (per-group state O(k) at any corpus size); the span
    finders' duplicate-gram reduction is a semi join (LeftSemi in the
    plan, never an inner join that would duplicate gram rows)."""
    from bigdatafraude_ml_graphx_spark.plans import (
        formatted_plan,
        uses_window_group_limit,
    )

    for name in ("q239_source_quota", "q246_knn_graph",
                 "q247_curation_pipeline"):
        assert uses_window_group_limit(q.QUERIES[name](spark, sf_dir)), name
    for name in ("q240_duplicate_spans", "q242_cut_duplicate_spans"):
        assert "LeftSemi" in formatted_plan(q.QUERIES[name](spark, sf_dir)), name
