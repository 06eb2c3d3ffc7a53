#!/usr/bin/env python
"""End-to-end telemetry walkthrough — the Minerva core story at toy
scale, composed from this engine's operators (each individually
oracle-verified by the declared-query catalog; this script shows how
they chain into the product):

  1. harvest      — vendor PM-XML files → DataPackage rows
                    (sources/xml_pm.py, OP-SRC-PLUGIN)
  2. load         — entity resolution + keyed upsert into a
                    date-partitioned trend store (plans/load.py)
  3. aggregate    — 15m → 1h → 1d time chain from the declared
                    trend-store part; averages re-aggregate exactly
                    via (sum, samples) partials (plans/instance.py)
  4. rollup       — cell → network entity aggregation over a
                    broadcast relation (OP-JOIN-REL/OP-AGG-ENTITY)
  5. trigger      — severity thresholds over the hourly KPI
                    (operators/trigger.py, OP-TRIG-THRESH)
  6. notification — alert-storm collapse (cooldown islands) and the
                    store-staleness health report

Run: python examples/telemetry_pipeline.py  [scratch_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_PM_TEMPLATE = """<?xml version="1.0"?>
<measCollecFile>
 <measData>
{infos}
 </measData>
</measCollecFile>
"""

_INFO_TEMPLATE = """  <measInfo>
   <granPeriod duration="PT900S" endTime="{end}"/>
   <measTypes>pkts latency</measTypes>
{values}
  </measInfo>
"""


def write_pm_fixture(d: str) -> str:
    """8 quarter-hour periods x 2 networks x 2 cells each — one PM
    file per network, the vendor's one-file-per-node convention."""
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for net in ("g1", "g2"):
        infos = []
        for p in range(8):
            m = (p + 1) * 15  # period p ends at the next quarter hour
            end = f"2024-01-01T{m // 60:02d}:{m % 60:02d}:00Z"
            values = []
            for cell in (1, 2):
                pkts = 100 * cell + 10 * p
                # cell 1 of g1 breaches the latency threshold in the
                # last half of the window -> a notification storm
                lat = 95.0 if (net, cell) == ("g1", 1) and p >= 4 else 4.5
                values.append(
                    f'   <measValue measObjLdn="network={net},'
                    f'cell={cell}">\n    <measResults>{pkts} {lat}'
                    f"</measResults>\n   </measValue>")
            infos.append(_INFO_TEMPLATE.format(end=end,
                                               values="\n".join(values)))
        with open(os.path.join(d, f"{net}.xml"), "w") as fh:
            fh.write(_PM_TEMPLATE.format(infos="\n".join(infos)))
    return d


def run(spark, scratch: str) -> dict:
    from python_minerva_etl_spark.operators.trigger import (ThresholdRule,
                                                            evaluate)
    from python_minerva_etl_spark.plans.instance import (Relation, Trend,
                                                         TrendStorePart,
                                                         aggregate_entity,
                                                         aggregate_time)
    from python_minerva_etl_spark.plans.load import load_data

    pm_dir = write_pm_fixture(os.path.join(scratch, "pm_in"))
    store = os.path.join(scratch, "trend_store")
    shutil.rmtree(store, ignore_errors=True)
    out: dict = {}

    # 1+2. harvest + load (idempotent keyed upsert: run twice, same rows)
    for _ in range(2):
        load_data(spark, "xml-pm", pm_dir, store, granularity="15m")
    raw = spark.read.parquet(store)
    out["store_rows"] = raw.count()

    # 3. aggregate chain from the declaration
    part = TrendStorePart("cell_kpis", (
        Trend("pkts", time_aggregation="sum", entity_aggregation="sum"),
        Trend("latency", time_aggregation="avg", entity_aggregation="avg"),
    ))
    hourly = aggregate_time(raw, part, "entity_key", "timestamp", "1h")
    out["hourly_rows"] = hourly.count()
    # 1h -> 1d uses the RE-AGG algebra (samples SUM, partial sums
    # SUM), not the raw-row algebra — the navigator owns that rule
    from python_minerva_etl_spark.plans.navigator import reaggregate_time
    daily = reaggregate_time(hourly, part, "entity_key", "timestamp", "1d")
    out["daily_rows"] = daily.count()
    out["daily_samples_per_entity"] = (
        daily.agg(F.min("samples").alias("mn"),
                  F.max("samples").alias("mx")).collect()[0])

    # 4. cell -> network rollup over the parsed DN hierarchy
    # (entity_key is the md5 surrogate; the dn column carries the
    # hierarchy, exactly like the reference's directory)
    rel = (raw.select(F.col("entity_key").alias("cell"), "dn")
           .distinct()
           .withColumn("network",
                       F.regexp_extract("dn", r"network=([^,]+)", 1))
           .drop("dn"))
    rolled = aggregate_entity(
        hourly, part, rel, Relation("cell->network", "cell", "network"),
        "entity_key", "timestamp")
    out["network_rows"] = rolled.count()

    # 5. trigger on the hourly latency partial (avg = sum/samples)
    kpi = hourly.select(
        "entity_key", "timestamp",
        (F.col("latency").cast("double") / F.col("samples"))
        .alias("latency_avg"))
    rule = ThresholdRule(
        name="high_latency", kpi="latency_avg",
        thresholds=(("critical", 90.0), ("warning", 50.0)),
        weights={"critical": 100, "warning": 10})
    notifs = evaluate(kpi, rule, entity_col="entity_key",
                      ts_col="timestamp")
    out["notifications"] = notifs.count()

    # 6. storm collapse (90-min cooldown) + staleness report
    from pyspark.sql.window import Window
    w = Window.partitionBy("entity_key").orderBy("timestamp")
    gap = (F.unix_micros(F.col("timestamp"))
           - F.unix_micros(F.lag("timestamp").over(w)))
    storms = (notifs
              .withColumn("new", F.when(
                  gap.isNull() | (gap > 90 * 60 * 1_000_000), 1)
                  .otherwise(0))
              .withColumn("storm", F.sum("new").over(
                  w.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow)))
              .groupBy("entity_key", "storm")
              .agg(F.count("*").alias("n_alerts")))
    out["storms"] = storms.count()

    hwm = raw.agg(F.max("timestamp").alias("hwm"))
    stale = (raw.groupBy("entity_key")
             .agg(F.max("timestamp").alias("last_seen"))
             .crossJoin(F.broadcast(hwm))
             .filter(F.unix_micros("hwm") - F.unix_micros("last_seen")
                     > 3600 * 1_000_000))
    out["stale_entities"] = stale.count()
    return out


if __name__ == "__main__":
    from python_minerva_etl_spark.session import get_spark

    scratch = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch_telemetry")
    spark = get_spark(app_name="telemetry-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in run(spark, scratch).items():
        print(f"{k}: {v}")
    spark.stop()
