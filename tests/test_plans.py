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
    for name in ("dedup_minhash_pairs", "dedup_simhash"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
