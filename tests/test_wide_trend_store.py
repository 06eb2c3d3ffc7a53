"""Wide trend stores — Minerva tables have one column per counter
(hundreds of trends per part).  Assert the engine's core promises on a
200-trend store: per-trend aggregation compiles from the declaration,
and a narrow projection prunes the parquet scan to the touched columns
(the reason this engine stores parquet at all — SURVEY.md §4)."""

from __future__ import annotations

import contextlib
import io
import os
import shutil

from pyspark.sql import functions as F

from python_minerva_etl_spark.plans.instance import (Trend, TrendStorePart,
                                                     aggregate_time)

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "wide")

N_TRENDS = 200


def _build_wide_store(spark, path: str):
    base = spark.range(0, 2000).select(
        (F.col("id") % 50).alias("entity_id"),
        F.timestamp_seconds(F.lit(1704067200) + (F.col("id") % 96) * 900)
        .alias("ts"),
        *[(F.col("id") * (i + 1) % 997).cast("double").alias(f"counter_{i}")
          for i in range(N_TRENDS)])
    base.write.mode("overwrite").parquet(path)


def test_wide_store_prunes_and_aggregates(spark):
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "wide_store")
    if not os.path.exists(path):
        _build_wide_store(spark, path)
    df = spark.read.parquet(path)
    assert len(df.columns) == N_TRENDS + 2

    # narrow projection: scan must read only the 3 touched columns
    narrow = df.select("entity_id", "ts", "counter_7")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        narrow.explain(mode="formatted")
    read_lines = [ln for ln in buf.getvalue().splitlines()
                  if "ReadSchema" in ln][0]
    assert "counter_7" in read_lines
    assert "counter_8" not in read_lines and "counter_199" not in read_lines

    # declared part over a subset of trends -> compiled hourly agg
    part = TrendStorePart("part_a", tuple(
        Trend(f"counter_{i}", "double", "sum", "sum") for i in (0, 7, 199)))
    hourly = aggregate_time(df, part, "entity_id", "ts", "1h")
    assert set(hourly.columns) == {
        "entity_id", "ts", "counter_0", "counter_7", "counter_199", "samples"}
    row = hourly.agg(F.sum("samples")).collect()[0][0]
    assert row == 2000  # every source row lands in exactly one bucket
