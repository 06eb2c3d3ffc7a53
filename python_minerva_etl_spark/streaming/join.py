"""Stream-stream interval join (OP-STR depth: event correlation).

Structured Streaming's watermarked stream-stream join is the streaming
twin of the batch banded interval join (operators/joins.py::range_join):
each side buffers only rows inside its watermark horizon, and the time
bound in the join condition lets Spark evict state as event time
advances — per-key state is O(rows within the interval window), never
O(stream).

At 100 TB/day the state bound is the whole point: an unbounded-condition
stream join would buffer both streams forever; the interval condition
plus watermark caps state at (rate × interval + watermark slack) per
key, independent of total volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key: str = "user_id",
                         interval: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Inner-join ``left`` events to ``right`` events with the same
    ``key`` where the right event lands in ``[left.ts, left.ts +
    interval]``.  Both sides must be streaming DataFrames with an
    event-time ``ts`` column; each gets its own watermark so state on
    both buffers is evicted.

    Returns (user_id, left_id, right_id, gap_us) — gap measured in
    microseconds, exactly comparable with a batch SQL join oracle.
    """
    lhs = (left.withWatermark("ts", watermark)
           .select(F.col(key).alias("l_key"),
                   F.col("event_id").alias("left_id"),
                   F.col("ts").alias("l_ts")))
    rhs = (right.withWatermark("ts", watermark)
           .select(F.col(key).alias("r_key"),
                   F.col("event_id").alias("right_id"),
                   F.col("ts").alias("r_ts")))
    cond = ((F.col("l_key") == F.col("r_key"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(
                f"INTERVAL {interval}")))
    return (lhs.join(rhs, cond)
            .select(F.col("l_key").alias(key), "left_id", "right_id",
                    (F.unix_micros("r_ts") - F.unix_micros("l_ts"))
                    .alias("gap_us")))


def run_append_available_now(spark, result: DataFrame,
                             query_name: str) -> DataFrame:
    """Append-mode availableNow execution into a memory sink — inner
    joins emit each match in the micro-batch that completes it, so a
    single-pass run equals the batch join exactly."""
    q = (result.writeStream.format("memory")
         .queryName(query_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    q.stop()
    return spark.table(query_name)
