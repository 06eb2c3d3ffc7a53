"""Cohort retention and ordered funnel conversion — the notification-
store analytics Minerva deployments run over event/alarm streams
(reference: notification stores are append-only typed event records,
``minerva/storage/notification/notificationstore.py`` [U]; the
retention/funnel shapes are the standard product-analytics queries a
migrating user would otherwise hand-write).

Scale shapes:

- retention: one shuffle keyed by entity for the first-seen aggregate,
  one distinct over (entity, bucket) sharing the same key, then a
  grouped count over (cohort, index) — output cardinality is
  |cohorts| × |buckets|, tiny at any input scale.
- funnel: each step is a min-after-previous-step aggregate keyed by
  entity; after the first shuffle every later join/agg reuses the
  entity hash partitioning (co-partitioned, no extra exchange), and
  the result is a single row of counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(events: DataFrame, entity_col: str = "user_id",
                     ts_col: str = "ts",
                     bucket: str = "week") -> DataFrame:
    """Classic retention matrix: entities grouped by first-activity
    ``bucket`` (the cohort); for each later bucket, how many were
    active, and what fraction of the cohort's week-0 size that is.

    Returns ``(cohort, bucket_ix, n_active, retention)`` — retention
    is relative to the cohort's own bucket-0 count, so every cohort
    row 0 reads 1.0.
    """
    days = {"week": 7, "day": 1}[bucket]
    firsts = (events.groupBy(entity_col)
              .agg(F.date_trunc(bucket, F.min(ts_col)).alias("cohort")))
    active = (events.select(entity_col,
                            F.date_trunc(bucket, ts_col).alias("b"))
              .distinct())
    counts = (active.join(firsts, entity_col)
              .groupBy("cohort",
                       (F.datediff(F.col("b"), F.col("cohort"))
                        / days).cast("int").alias("bucket_ix"))
              .agg(F.count("*").alias("n_active")))
    # n_active is countDistinct by construction (active is distinct)
    from pyspark.sql.window import Window
    w = Window.partitionBy("cohort")
    base = F.max(F.when(F.col("bucket_ix") == 0,
                        F.col("n_active"))).over(w)
    return counts.select(
        "cohort", "bucket_ix", "n_active",
        (F.col("n_active").cast("double")
         / base.cast("double")).alias("retention"))


def funnel_conversion(events: DataFrame, steps: list[str],
                      entity_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: an entity reaches step i only with an event of
    type ``steps[i]`` STRICTLY AFTER its step-(i-1) completion time
    (first qualifying occurrence).  Returns ONE row:
    ``n_<step>`` per step plus ``conv_<step>`` = fraction of the
    previous step's entities that advanced.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    per = (events.filter(F.col(type_col) == steps[0])
           .groupBy(entity_col).agg(F.min(ts_col).alias("t_0")))
    for i, s in enumerate(steps[1:], 1):
        nxt = (events.filter(F.col(type_col) == s)
               .join(per.select(entity_col, f"t_{i-1}"), entity_col)
               .filter(F.col(ts_col) > F.col(f"t_{i-1}"))
               .groupBy(entity_col).agg(F.min(ts_col).alias(f"t_{i}")))
        per = per.join(nxt.select(entity_col, f"t_{i}"),
                       entity_col, "left")
    aggs = [F.count(f"t_{i}").alias(f"n_{s}")
            for i, s in enumerate(steps)]
    row = per.agg(*aggs)
    convs = [
        (F.col(f"n_{b}").cast("double")
         / F.col(f"n_{a}").cast("double")).alias(f"conv_{b}")
        for a, b in zip(steps, steps[1:])]
    return row.select("*", *convs)
