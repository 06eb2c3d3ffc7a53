"""Incremental-equals-full property: OP-MAT-INC after arbitrary
late-arrival replay orders equals a one-shot full recompute
(SURVEY.md §5.4 — the state machine's safety net)."""

from __future__ import annotations

import os
import random
import shutil

from pyspark.sql import functions as F

from python_minerva_etl_spark.operators.materialization import (
    materialize_incremental, read_target)
from python_minerva_etl_spark.registry import load_table

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "mat_prop")


def _compute(src):
    return (src.groupBy("user_id", "__bucket")
            .agg(F.count("*").alias("samples"),
                 F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                 .alias("sum_value"))
            .withColumn("day", F.col("__bucket")))


def _canon(df):
    return sorted(map(tuple, df.select(
        "user_id", "day", "samples", "sum_value").collect()))


def test_incremental_equals_full_under_late_arrivals(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    full_dir = os.path.join(SCRATCH, "full")
    inc_dir = os.path.join(SCRATCH, "inc")
    for seed in (7, 42):
        shutil.rmtree(SCRATCH, ignore_errors=True)
        # full one-shot
        materialize_incremental(
            spark, ev, "ts", "1d", _compute,
            os.path.join(full_dir, "t"), os.path.join(full_dir, "s"))
        expected = _canon(read_target(spark, os.path.join(full_dir, "t")))

        # incremental: replay in 3 random slices (late arrivals jumble
        # event order arbitrarily across days)
        rng = random.Random(seed)
        ids = [r.event_id for r in ev.select("event_id").collect()]
        rng.shuffle(ids)
        cut1, cut2 = len(ids) // 3, 2 * len(ids) // 3
        slices = [set(ids[:cut1]), set(ids[:cut2]), None]  # cumulative
        n_recomputed = []
        for s in slices:
            batch = ev if s is None else ev.filter(F.col("event_id").isin(s))
            n = materialize_incremental(
                spark, batch, "ts", "1d", _compute,
                os.path.join(inc_dir, "t"), os.path.join(inc_dir, "s"))
            n_recomputed.append(n)
        got = _canon(read_target(spark, os.path.join(inc_dir, "t")))
        assert got == expected, f"seed {seed}: incremental != full"
        # later runs must not recompute every bucket from scratch
        assert n_recomputed[0] > 0


def test_unchanged_rerun_recomputes_nothing(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    t, s = os.path.join(SCRATCH, "t"), os.path.join(SCRATCH, "s")
    n1 = materialize_incremental(spark, ev, "ts", "1d", _compute, t, s)
    n2 = materialize_incremental(spark, ev, "ts", "1d", _compute, t, s)
    assert n1 == 30 and n2 == 0  # 30 days of data; second run is a no-op


def test_deleted_buckets_are_removed_from_target(spark):
    """Retention/GDPR purge: buckets that vanish from the source must
    vanish from the target (incremental == full under deletions)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    t, s = os.path.join(SCRATCH, "t"), os.path.join(SCRATCH, "s")
    materialize_incremental(spark, ev, "ts", "1d", _compute, t, s)
    purged = ev.filter(F.date_trunc("day", "ts")
                       != F.lit("2024-01-05 00:00:00").cast("timestamp"))
    materialize_incremental(spark, purged, "ts", "1d", _compute, t, s)
    got = _canon(read_target(spark, t))
    # full recompute over the purged source
    full_dir = os.path.join(SCRATCH, "full2")
    materialize_incremental(spark, purged, "ts", "1d", _compute,
                            os.path.join(full_dir, "t"),
                            os.path.join(full_dir, "s"))
    want = _canon(read_target(spark, os.path.join(full_dir, "t")))
    assert got == want
    assert all(str(r[1])[:10] != "2024-01-05" for r in got)


def test_apply_changes_to_agg_retracts_and_drops_empty_groups(spark):
    """Signed re-aggregation from a change feed: deletes retract,
    update pre+post pairs net out, and a group whose count reaches
    zero disappears — maintained equals recomputed."""
    from python_minerva_etl_spark.operators.materialization import (
        apply_changes_to_agg)

    stored = spark.createDataFrame(
        [("a", 2, 30.0), ("b", 1, 5.0), ("c", 1, 7.0)],
        "g string, samples long, sum_value double")
    changes = spark.createDataFrame(
        [("a", 10.0, "update_preimage"),   # a: 30 - 10 + 12 = 32
         ("a", 12.0, "update_postimage"),
         ("b", 5.0, "delete"),             # b: count 0 -> dropped
         ("c", 3.0, "insert"),             # c: 7 + 3 = 10, n = 2
         ("d", 9.0, "insert")],            # d: new group
        "g string, value double, _change_type string")
    got = {r.g: (r.samples, float(r.sum_value))
           for r in apply_changes_to_agg(
               stored, changes, ["g"], "value").collect()}
    assert got == {"a": (2, 32.0), "c": (2, 10.0), "d": (1, 9.0)}


def test_navigator_nesting_partial_order():
    from python_minerva_etl_spark.plans.navigator import (choose_level,
                                                          nests_in)

    assert nests_in("15m", "1h") and nests_in("15m", "1d")
    assert nests_in("1h", "1d") and nests_in("1d", "1w")
    assert nests_in("1d", "1month")
    assert not nests_in("1w", "1month")       # weeks straddle months
    assert not nests_in("1month", "1w")
    assert not nests_in("1d", "1h")           # never downward
    assert choose_level(["15m", "1h"], "1d") == "1h"
    assert choose_level(["15m", "1h", "1d"], "1d") == "1d"
    assert choose_level(["15m", "1h", "1d"], "1w") == "1d"
    assert choose_level(["1w"], "1month") is None
    assert choose_level([], "1d") is None


def test_navigated_rollup_equals_direct(spark):
    """1d via the navigator (15m -> 1h partials -> re-agg) must equal
    the direct 1d aggregation over raw rows, including the exact
    (sum, samples) average."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.plans.instance import (Trend,
                                                         TrendStorePart,
                                                         aggregate_time)
    from python_minerva_etl_spark.plans.navigator import navigate
    from python_minerva_etl_spark.registry import load_table

    ev = (load_table(spark, "/root/testdata/sf0.01", "events")
          .select("user_id", "ts", "value",
                  F.col("value").alias("peak")))
    part = TrendStorePart("kpis", (
        Trend("value", time_aggregation="sum"),
        Trend("peak", time_aggregation="max"),
    ))
    m15 = aggregate_time(ev, part, "user_id", "ts", "15m")
    m1h = aggregate_time(ev, part, "user_id", "ts", "1h")

    chosen, routed = navigate({"15m": m15, "1h": m1h}, "1d", part,
                              "user_id", "ts")
    assert chosen == "1h"
    direct = aggregate_time(ev, part, "user_id", "ts", "1d")

    key = lambda r: (r.user_id, r.ts)
    a = {key(r): (r.value, r.peak, r.samples) for r in routed.collect()}
    b = {key(r): (r.value, r.peak, r.samples) for r in direct.collect()}
    assert a == b  # exact, decimal partials included


def test_navigator_covers_all_fixed_granularities():
    """Every granularity the package declares must be navigable —
    the sub-15m and 30m names included (regression: KeyError on
    '5m')."""
    from python_minerva_etl_spark.plans.navigator import (choose_level,
                                                          nests_in)

    assert choose_level(["5m"], "5m") == "5m"
    assert nests_in("5m", "1h") and nests_in("30m", "1h")
    assert nests_in("1m", "1d") and nests_in("30m", "1d")
    assert choose_level(["1m", "5m", "30m"], "1h") == "30m"
    assert choose_level(["900", "3600"], "1d") == "3600"  # alias names
