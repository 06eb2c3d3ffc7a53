"""Physical-plan audits — the 100 TB design assertions (SURVEY.md §4):
filters and projections reach the parquet scan, dims broadcast, top-k
avoids full sorts.  These lock in the plan shape so a refactor that
silently de-optimizes fails CI."""

from __future__ import annotations

from python_minerva_etl_spark.queries.catalog import all_queries

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = all_queries()[name].spark(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_time_range")
    assert "PushedFilters: [" in plan
    # value/type/ts predicates should appear as pushed filters
    assert "GreaterThan(value,50.0)" in plan.replace(" ", "")


def test_projection_prunes_scan_columns(spark):
    plan = _plan(spark, "project_select")
    # ReadSchema must carry only the 4 projected columns
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "l_extendedprice" not in read and "l_shipdate" not in read
    assert "l_quantity" in read


def test_dimension_joins_broadcast(spark):
    plan = _plan(spark, "rollup_entity")
    assert "BroadcastHashJoin" in plan
    # the two dims must not sort-merge
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "topk_worst")
    assert "TakeOrderedAndProject" in plan


def test_agg_is_partial_then_final(spark):
    """Time aggregation must map-side combine (partial hash agg before
    the exchange) — the shape that keeps the shuffle small at scale."""
    plan = _plan(spark, "agg_time_1h")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_semi_anti_stay_semi_anti(spark):
    assert "LeftSemi" in _plan(spark, "join_semi")
    assert "LeftAnti" in _plan(spark, "join_anti")


def test_whole_stage_codegen_covers_flagship(spark):
    import contextlib
    import io

    df = all_queries()["agg_time_1h"].spark(spark, SF)
    df.collect()  # AQE: codegen spans only exist in the executed plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "codegen id" in plan, plan


def test_lsh_band_joins_are_not_cross_joins(spark):
    """The dedup scale paths must bucket-join, never cartesian: a
    refactor that degrades the band join to a cross join would still
    pass rows-only checks but melt at 100 TB."""
    for name in ("dedup_minhash_pairs", "dedup_simhash",
                 # round-5: the containment prefix filter and the
                 # exact Jaccard prefix join are equi-joins on tok
                 "dedup_containment", "dedup_near_pairs",
                 "dedup_ngram_jaccard"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key into the same bucket count
    must sort-merge join with ZERO Exchange — the co-located join that
    replaces terabyte shuffles in nightly rollups at scale."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.bucketing import (read_bucketed,
                                                              write_bucketed)
    from python_minerva_etl_spark.registry import load_table

    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"),
                   "b_orders", ["custkey"], 8, sort_cols=["custkey"])
    write_bucketed(cust.withColumnRenamed("c_custkey", "custkey"),
                   "b_customer", ["custkey"], 8, sort_cols=["custkey"])
    try:
        bo, bc = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_customer")
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bo.join(bc, "custkey").select(
                "custkey", "o_totalprice", "c_mktsegment")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain(mode="formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            # correctness unchanged vs the plain-table join
            expect = (load_table(spark, SF, "orders")
                      .join(load_table(spark, SF, "customer"),
                            F.col("o_custkey") == F.col("c_custkey"))
                      .count())
            assert joined.count() == expect
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_groupby_has_no_exchange(spark):
    """groupBy on the bucket key aggregates in place — no exchange."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.bucketing import (read_bucketed,
                                                              write_bucketed)
    from python_minerva_etl_spark.registry import load_table

    write_bucketed(load_table(spark, SF, "orders"), "b_orders_g",
                   ["o_custkey"], 8)
    try:
        agged = (read_bucketed(spark, "b_orders_g")
                 .groupBy("o_custkey").agg(F.count("*").alias("n")))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agged.explain(mode="formatted")
        assert "Exchange" not in buf.getvalue()
        assert agged.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_g")


def test_relation_rollup_broadcasts_relation(spark):
    """rollup_relation: the m:n relation table must broadcast (entity
    dims are MB-scale); the fact side shuffles once for the agg."""
    plan = _plan(spark, "rollup_relation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """A selective dim-side predicate injects a runtime bloom filter on
    the fact side of a shuffle join (Spark's row-group-level runtime
    pruning).  The fixture is far below the default 10 GB application
    -side threshold, so the test lowers it — on a real 100 TB fact scan
    the defaults fire without tuning; this locks in that nothing in our
    session/config posture suppresses the rewrite."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from python_minerva_etl_spark.registry import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
            "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_totalprice") > 400000)
        j = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
             .select("l_orderkey", "l_quantity", "o_totalprice"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain(mode="formatted")
        plan = buf.getvalue()
        assert "bloom_filter_agg" in plan      # built on the dim side
        assert "might_contain" in plan         # applied on the fact scan
        # and the rewrite did not change results
        n = j.count()
        for k, v in saved.items():
            spark.conf.set(k, v)
        assert n == (li.join(load_table(spark, SF, "orders").filter(
            F.col("o_totalprice") > 400000),
            F.col("l_orderkey") == F.col("o_orderkey")).count())
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_temperature_sample_filters_scan_local(spark):
    """The per-group probabilities must BROADCAST back onto the corpus:
    the sample is a scan-local filter, never a corpus shuffle."""
    plan = _plan(spark, "dataset_temperature_sample")
    assert "BroadcastHashJoin" in plan
    # the docs side of the join must come straight from the scan —
    # no Exchange between Scan parquet and the broadcast join's
    # streamed side (the only exchanges allowed feed the tiny
    # stats/totals aggregations)
    assert plan.count("BroadcastExchange") >= 1


def test_quality_prune_threshold_is_broadcast(spark):
    plan = _plan(spark, "corpus_quality_prune")
    assert "BroadcastHashJoin" in plan


def test_semantic_dedup_broadcasts_centroids_and_dropset(spark):
    """Centroid scoring and the dropped-id anti side must broadcast;
    the only sort-merge-scale shuffles allowed are the cluster-scoped
    pair join and the argmax aggregation."""
    plan = _plan(spark, "dedup_semantic")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # argmax is a real partial->final aggregate, not a window sort
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "Window" not in plan


def test_reservoir_sample_uses_take_ordered(spark):
    """The hash-rank reservoir must be per-partition top-k + k-row
    merge, never a global sort."""
    plan = _plan(spark, "dataset_reservoir_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full sort stage


def test_ewma_single_window_exchange(spark):
    """All 8 EWMA lags must share ONE entity sort: exactly one
    shuffle exchange and one Window operator."""
    import re
    plan = _plan(spark, "win_ewma")
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1


def test_cusum_shares_entity_sort(spark):
    """cumsum + running-min + broadcast baseline: the event table is
    exchanged on user_id once for the window chain (baseline agg adds
    its own agg exchange; no third)."""
    import re
    plan = _plan(spark, "anomaly_cusum")
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 2


def test_abc_class_windows_dimension_not_facts(spark):
    """The cumulative-share window must consume the aggregated part
    table; lineitem is scanned once."""
    import re
    plan = _plan(spark, "report_abc_class")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Window" in plan


def test_rolling_dau_explodes_pairs_not_facts(spark):
    """The 7x fan-out must sit above the distinct (user, day)
    aggregation, not the raw scan: an aggregate appears between scan
    and generate."""
    plan = _plan(spark, "rolling_active_users")
    gen_pos = plan.find("Generate")
    agg_pos = plan.find("HashAggregate")
    assert gen_pos > 0 and agg_pos > 0 and agg_pos < gen_pos


def test_rollup_entity_bucketed_has_no_join_exchange(spark):
    """rollup_entity_bucketed (r12): the fact-fact join must run on
    the co-bucketed layout with ZERO shuffle Exchange — the only
    shuffle left in the plan is the 25-group final aggregation, and
    no exchange partitions on the join key.  The plain rollup_entity
    keeps its fact shuffle (that's the layout delta being sold)."""
    import contextlib
    import io
    import re

    from python_minerva_etl_spark.queries.catalog import all_queries

    qs = all_queries()
    # kill auto-broadcast so the fact-fact join can't dodge the test
    # by broadcasting sf0.01's tiny orders table (the explicit
    # F.broadcast hints on the dims still apply)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = qs["rollup_entity_bucketed"].spark(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            qs["rollup_entity"].spark(spark, SF).explain(mode="formatted")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    shuffles = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(shuffles) == 1, plan      # the final groupBy only
    assert "hashpartitioning(n_name" in plan
    assert not re.search(r"hashpartitioning\((l_orderkey|o_orderkey)",
                         plan), plan
    # contrast: the plain twin shuffles the fact on the join key
    assert re.search(r"hashpartitioning\((l_orderkey|o_orderkey)",
                     buf2.getvalue())


def test_derive_num_buckets_scale_adaptive(tmp_path):
    """Bucket count derives from source bytes: floor at small inputs
    (sf0.1 keeps the 16-bucket layout), grows as a power of two with
    size, capped — a constant count tuned for one scale caps join
    parallelism at every other scale (measured 14.7 vs 12.8 s at 100x
    with 16 buckets on 32 cores)."""
    from python_minerva_etl_spark.operators.bucketing import (
        derive_num_buckets)

    f = tmp_path / "small.parquet"
    f.write_bytes(b"x" * 1024)
    assert derive_num_buckets(str(f)) == 16             # floor
    assert derive_num_buckets(str(tmp_path / "nope")) == 16

    target = 16 << 20
    g = tmp_path / "big.parquet"
    g.write_bytes(b"")
    os = __import__("os")
    os.truncate(g, 40 * target)                         # sparse 640 MB
    assert derive_num_buckets(str(g)) == 64             # next pow2(40)
    assert derive_num_buckets(str(g), cap=32) == 32     # cap wins
    # directory form sums the files
    d = tmp_path / "dir"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x")
    os.truncate(d / "a.parquet", 40 * target)
    assert derive_num_buckets(str(d)) == 64
