"""Streaming sessionization — native ``session_window`` (OP-STR-SESSION).

The streaming twin of ``operators/sessionize.py``: Spark's merging
session-window state tracks open sessions per key and closes one when
the watermark passes its end + gap.  An ``availableNow`` run over a
static inbox equals the batch gap-and-run form (session_window's
boundary rule: a new session starts when the gap is >= the threshold),
which is exactly the declared-oracle check.

State sizing at 100 TB: one open session per active key — bounded by
key cardinality, not event volume; the watermark bounds how long a
silent key's session lingers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "30 minutes",
                      key_col: str = "user_id") -> DataFrame:
    """Per-(key, session) aggregates over a gap-merged session window,
    decimal-exact like every other declared aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(key_col, F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
             .alias("sum_value"))
        .select(key_col,
                F.date_trunc("second", F.col("w.start"))
                .alias("session_start"),
                "n_events", "sum_value")
    )
