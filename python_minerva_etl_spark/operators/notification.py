"""Notification store — append-only typed event/alarm records.

Reference semantics (minerva/storage/notification/notificationstore.py
[U]): notifications are append-only rows ``(entity_id, timestamp,
attr1..attrN)``; they are never updated; reads are time-range +
attribute filters ordered by time (OP-SNK-NOTIF / OP-NOTIF-QUERY).

Spark mapping: ``mode("append")`` parquet partitioned by day — appends
are new files in existing partitions (no rewrite, no read-modify), and
time-range reads prune to the matching partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_notifications(df: DataFrame, path: str,
                         ts_col: str = "ts") -> None:
    (df.withColumn("__day", F.date_format(F.date_trunc("day", ts_col),
                                          "yyyy-MM-dd"))
     .write.mode("append").partitionBy("__day").parquet(path))


def query_notifications(spark: SparkSession, path: str,
                        start, end, ts_col: str = "ts",
                        predicate: str = "true") -> DataFrame:
    """Time-range + attribute-filter read, ordered by time.  The range
    filter hits the ``__day`` partition column first (partition
    pruning), then the row-level timestamp."""
    df = spark.read.parquet(path)
    return (df.filter((F.col(ts_col) >= F.lit(start))
                      & (F.col(ts_col) < F.lit(end)))
            .filter(F.expr(predicate))
            .drop("__day")
            .orderBy(ts_col))
