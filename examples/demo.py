#!/usr/bin/env python
"""End-to-end walkthrough of the Minerva workflow on this engine —
the script a migrating python-minerva-etl user reads first.

Covers the reference's operational loop (§3 of SURVEY.md):
  1. initialize   — declare the instance (here: dataclasses; YAML
                    directories work the same via MinervaInstance.load)
  2. load-data    — harvest a vendor CSV into a trend store
  3. aggregate    — 15m -> 1h -> 1d time rollups with exact
                    re-aggregatable averages
  4. entity rollup — cell -> site via a relation
  5. attributes   — history, change detection, curr view, as-of
  6. trigger      — thresholds -> notifications
  7. materialize  — incremental recompute on new data

Run: python examples/demo.py   (local[*]; writes under .scratch/demo)
"""

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from python_minerva_etl_spark.operators.attribute import curr_view  # noqa: E402
from python_minerva_etl_spark.operators.joins import asof_join  # noqa: E402
from python_minerva_etl_spark.operators.materialization import (  # noqa: E402
    materialize_incremental, read_target)
from python_minerva_etl_spark.operators.trigger import (  # noqa: E402
    ThresholdRule, evaluate)
from python_minerva_etl_spark.plans.instance import (  # noqa: E402
    Relation, Trend, TrendStorePart, aggregate_entity, aggregate_time,
    reaggregate_avg)
from python_minerva_etl_spark.plans.load import load_data  # noqa: E402
from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.sources.csv import ParserConfig  # noqa: E402

WORK = os.path.join(REPO, ".scratch", "demo")


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    spark = get_spark(app_name="minerva-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1+2: harvest a vendor file into a trend store ------------------
    csv = os.path.join(WORK, "pm_20240101.csv")
    with open(csv, "w") as fh:
        fh.write("cell,timestamp,pkts,drops\n")
        for h in range(24):
            for c in range(6):
                fh.write(f"cell={c},2024-01-01 {h:02d}:{(c * 7) % 60:02d}:00,"
                         f"{100 * h + c},{h % 5}\n")
    store = os.path.join(WORK, "trend_store")
    cfg = ParserConfig(entity_expression="concat('site=', cast(cell as string))")
    trends = load_data(spark, "csv", csv, store, cfg, granularity="1d")
    print(f"loaded trend store: {trends.count()} rows, "
          f"columns {trends.columns}")

    # -- 3: declared time aggregation with exact avg re-agg -------------
    part = TrendStorePart("main", (
        Trend("pkts", "integer", "sum", "sum"),
        Trend("drops", "integer", "avg", "avg")))
    hourly = aggregate_time(trends, part, "entity_key", "timestamp", "1h")
    daily_avg = reaggregate_avg(hourly, "drops", "entity_key", "timestamp", "1d")
    print("hourly buckets:", hourly.count(),
          "| daily avg rows:", daily_avg.count())

    # -- 4: entity rollup along a relation -------------------------------
    relation = trends.select(
        F.col("entity_key").alias("source_id"),
        F.lit("site-group-A").alias("target_id")).distinct()
    rolled = aggregate_entity(hourly, part, relation,
                              Relation("cell_to_group", "source_id",
                                       "target_id"),
                              "entity_key", "timestamp")
    print("rolled-up rows:", rolled.count())

    # -- 5: attribute curr-view + as-of ----------------------------------
    latest = curr_view(trends, key=["entity_key"],
                       order=["timestamp", "dn"])
    asof = asof_join(
        hourly.select("entity_key", F.col("timestamp").alias("ts"), "pkts"),
        trends.select("entity_key", F.col("timestamp").alias("ts"),
                      F.col("drops").alias("attr_drops")),
        key=["entity_key"], ts_col="ts", attr_cols=["attr_drops"])
    print("curr-view rows:", latest.count(), "| as-of rows:", asof.count())

    # -- 6: trigger -> notifications -------------------------------------
    rule = ThresholdRule(
        name="drop_rate", kpi="cast(drops as double)",
        thresholds=(("critical", 4.0), ("warning", 2.0)),
        weights={"critical": 100, "warning": 10})
    notif = evaluate(trends, rule, "entity_key", "timestamp")
    print("notifications:", notif.groupBy("severity").count().collect())

    # -- 7: incremental materialization ----------------------------------
    target = os.path.join(WORK, "mat_target")
    state = os.path.join(WORK, "mat_state")

    def compute(src):
        return (src.groupBy("entity_key", "__bucket")
                .agg(F.count("*").alias("samples"),
                     F.sum(F.col("pkts").cast("decimal(28,6)"))
                     .cast("double").alias("sum_pkts")))

    n1 = materialize_incremental(spark, trends, "timestamp", "1h",
                                 compute, target, state)
    n2 = materialize_incremental(spark, trends, "timestamp", "1h",
                                 compute, target, state)
    print(f"materialized buckets: first run {n1}, unchanged rerun {n2}")
    print("materialized rows:", read_target(spark, target).count())
    spark.stop()


if __name__ == "__main__":
    main()
