"""Attribute-store operators — slowly-changing entity attributes.

Reference semantics (minerva/storage/attribute/attributestore.py,
attribute.py [U]): attribute history is append-only rows
``(entity_id, timestamp, attrs…, hash)``; the *curr* view is the
latest row per entity; *compacting* collapses consecutive equal rows
into validity ranges; change detection stores a new row only when the
hash differs from the previous row.

Spark mapping: pure window functions over ``(entity)`` partitions —
one shuffle on the entity key, then all three operators are
narrow.  At 100 TB the history table is partitioned by entity-hash
bucket so the window shuffle is a no-op for bucketed storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _w(key: list[str], order: list[str | Column]):
    return Window.partitionBy(*key).orderBy(*order)


def attribute_fingerprint(attr_cols: list[str]) -> Column:
    """Stable hash of the attribute tuple (the reference stores a hash
    column per history row to cheapen change detection)."""
    return F.md5(F.concat_ws("\x1f", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
        for c in attr_cols]))


def store_attributes(spark, batch: DataFrame, path: str,
                     key: list[str], ts_col: str,
                     attr_cols: list[str]) -> int:
    """Attribute-store write: append only rows that CHANGE an entity's
    current attribute state (ref: attributestore.store + compacting
    [U]) — re-loading identical attribute data is a no-op, so history
    stays minimal without a rewrite.

    Returns the number of appended rows.  The batch is first reduced
    to its own change points (multiple updates per entity in one batch
    keep only transitions), then rows equal to the stored *current*
    state are dropped via a broadcast join on (key, hash).
    """
    import os

    batch = batch.withColumn("__hash", attribute_fingerprint(attr_cols))
    # collapse within-batch: keep only transition rows
    batch = change_detect(batch, key, [ts_col], attr_cols)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        # exact replay of already-stored rows is a no-op regardless of
        # batch shape (idempotent reload)
        seen = existing.select(*key, ts_col, "__hash")
        batch = batch.join(F.broadcast(seen), [*key, ts_col, "__hash"],
                           "left_anti")
        curr = curr_view(existing, key, [ts_col]).select(
            *key, F.col("__hash").alias("__curr_hash"))
        # the first remaining batch row per entity is redundant iff it
        # equals the stored current state; eqNullSafe — a NEW entity has
        # no curr row and must not be dropped by NULL three-valued logic
        w = Window.partitionBy(*key).orderBy(ts_col)
        first = F.row_number().over(w) == 1
        batch = (batch.join(F.broadcast(curr), key, "left")
                 .withColumn("__rn1", first)
                 .filter(~(F.col("__rn1")
                           & F.col("__hash").eqNullSafe(F.col("__curr_hash"))))
                 .drop("__curr_hash", "__rn1"))
    appended = batch.count()
    if appended:
        batch.write.mode("append").parquet(path)
    return appended


def curr_view(df: DataFrame, key: list[str], order: list) -> DataFrame:
    """Latest row per entity (OP-WIN-LATEST).  ``order`` must be a total
    order (include a unique tiebreak) for determinism."""
    w = _w(key, [F.desc(c) if isinstance(c, str) else c for c in order])
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def change_detect(df: DataFrame, key: list[str], order: list,
                  attr_cols: list[str]) -> DataFrame:
    """Rows where any attribute differs from the previous row
    (OP-WIN-CHANGE).  The reference compares an md5 hash of the attr
    tuple; comparing a concat-hash keeps NULL semantics simple."""
    w = _w(key, order)
    fingerprint = attribute_fingerprint(attr_cols)
    prev = F.lag(fingerprint).over(w)
    changed = prev.isNull() | (fingerprint != prev)
    return df.withColumn("__changed", changed).filter("__changed").drop("__changed")


def compact(df: DataFrame, key: list[str], ts_col: str, order: list,
            attr_cols: list[str]) -> DataFrame:
    """Collapse consecutive equal rows into validity ranges
    (OP-WIN-COMPACT): run-id = running count of change points, then
    min/max timestamp per run."""
    w = _w(key, order)
    fingerprint = attribute_fingerprint(attr_cols)
    prev = F.lag(fingerprint).over(w)
    changed = F.when(prev.isNull() | (fingerprint != prev), 1).otherwise(0)
    run = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grouped = (df.withColumn("__run", run)
               .groupBy(*key, "__run",
                        *[F.col(c) for c in attr_cols])
               .agg(F.min(ts_col).alias("ts_start"),
                    F.max(ts_col).alias("ts_end"),
                    F.count("*").alias("n_rows")))
    return grouped.drop("__run")
