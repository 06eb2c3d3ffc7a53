"""Streaming tumbling-window aggregation (OP-STR-TUMBLE/WATERMARK).

The streaming twin of OP-AGG-TIME: identical decimal-exact aggregates
over ``window(ts, …)`` buckets, so an ``availableNow`` run equals the
batch query bit-for-bit (stream-batch parity — the driver-checkable
form of streaming correctness).

Watermark = Minerva's ``stability_delay``: a bucket finalizes once the
event-time high-water-mark passes bucket_end + delay.  Late rows inside
the delay update the bucket; later ones are dropped (the reference
instead re-opens buckets — that path is the batch backfill in
operators/materialization.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (harvest-polling twin).

    Schema comes from a batch read; the ns-timestamp column arrives as
    long (legacy conf) and is normalized exactly like the batch path.
    """
    from ..registry import table_path

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    # the file source consumes a *directory* (Minerva's harvest inbox);
    # stage the table file into one
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ..queries.trend import _scratch_tag
    tag = _scratch_tag(sf_dir)
    inbox = os.path.join(repo_root, ".scratch", f"stream_inbox_{tag}")
    os.makedirs(inbox, exist_ok=True)
    staged = os.path.join(inbox, "events.parquet")
    if not os.path.exists(staged):
        shutil.copyfile(path, staged)
    stream = spark.readStream.schema(schema).parquet(inbox)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # µs NTZ fixture — same UTC reinterpretation as registry.load_table
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_agg(events: DataFrame, width: str = "1 hour",
                 watermark: str = "30 minutes",
                 slide: str | None = None,
                 key_col: str = "user_id") -> DataFrame:
    """Per-(key, window) aggregates with the same decimal-exact
    arithmetic as the batch flagship.  ``slide`` turns the tumbling
    window into a hopping one (each event then lands in width/slide
    overlapping windows) — state size grows by the same factor, which
    is the knob to mind at 100 TB."""
    win = (F.window("ts", width, slide) if slide
           else F.window("ts", width)).alias("win")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(key_col, win)
        .agg(
            F.count("*").alias("samples"),
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
            .alias("sum_value"),
        )
        .select(key_col, F.col("win.start").alias("bucket"),
                "samples", "sum_value")
    )


def run_available_now(spark: SparkSession, result: DataFrame,
                      query_name: str,
                      output_mode: str = "complete") -> DataFrame:
    """Execute the streaming plan over all currently-available input
    (batch-parity mode) into an in-memory sink; returns the final
    table.  ``complete`` output mode emits every window regardless of
    watermark progress — required for exact batch parity of
    aggregations (append would hold back the last windows); row-level
    plans (stream-static enrichment) pass ``append``."""
    q = (result.writeStream.format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    q.stop()
    return spark.table(query_name)
