"""Incremental materialization — Minerva's one true state machine.

Reference semantics (minerva/storage/trend/materialization.py +
trend_directory SQL [U]): a materialization derives a target trend
store from sources; per (materialization, bucket) the system tracks a
*fingerprint* of the sources (max modified timestamp per source part);
a bucket is re-materialized only when its fingerprint changed and the
delays (processing_delay, stability_delay) have passed; late data
after finalization (within reprocessing_period) re-opens the bucket.

Spark mapping (OP-MAT-INC): state lives in a small parquet table
``(bucket, fingerprint)``; each run
1. scans the source once, computing per-bucket content fingerprints
   (order-independent: sum of row-hashes — no ``modified`` column
   needed, and robust to upserts that keep counts equal);
2. anti-joins against the stored state to find changed buckets;
3. recomputes ONLY those buckets through the user's aggregation plan
   and dynamic-partition-overwrites them in the target;
4. overwrites the state.

At 100 TB the fingerprint scan is a metadata-cheap aggregate over the
time-partitioned source (partition pruning limits it to the
reprocessing window), and the recompute touches only changed
partitions — the property test (incremental == full recompute under
random late arrivals, tests/test_materialization.py) is the safety
net the reference gets from PostgreSQL transactions.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..granularity import trunc_col


def bucket_fingerprints(source: DataFrame, ts_col: str,
                        granularity: str) -> DataFrame:
    """Order-independent per-bucket content fingerprint: count + sum of
    64-bit row hashes (wrap-around sum is fine for change detection)."""
    row_hash = F.xxhash64(*[F.col(c) for c in source.columns])
    return (
        source.groupBy(trunc_col(F.col(ts_col), granularity).alias("__bucket"))
        .agg(F.count("*").alias("n_rows"),
             # decimal accumulation — a long sum of 64-bit hashes
             # overflows under ANSI mode
             F.sum(row_hash.cast("decimal(38,0)")).alias("hash_sum"))
        .select("__bucket",
                F.xxhash64(F.col("n_rows"), F.col("hash_sum").cast("string"))
                .alias("fingerprint"))
    )


def changed_buckets(spark: SparkSession, fingerprints: DataFrame,
                    state_path: str) -> DataFrame:
    """Buckets whose fingerprint is new or differs from stored state."""
    if not os.path.exists(state_path):
        return fingerprints.select("__bucket", "fingerprint")
    state = spark.read.parquet(state_path).select(
        F.col("__bucket").alias("__sb"), F.col("fingerprint").alias("sfp"))
    joined = fingerprints.join(
        state, fingerprints["__bucket"] == state["__sb"], "left")
    return (joined.filter(F.col("sfp").isNull()
                          | (F.col("fingerprint") != F.col("sfp")))
            .select("__bucket", "fingerprint"))


def _deleted_buckets(spark: SparkSession, fingerprints: DataFrame,
                     state_path: str) -> list:
    """Buckets present in state but absent from the current source —
    their data was purged (retention/GDPR) and the target partitions
    must go too, or incremental != full under deletions."""
    if not os.path.exists(state_path):
        return []
    state = spark.read.parquet(state_path).select("__bucket")
    gone = state.join(fingerprints.select("__bucket"), "__bucket",
                      "left_anti")
    return [r["__bucket"] for r in gone.collect()]


def materialize_incremental(
        spark: SparkSession, source: DataFrame, ts_col: str,
        granularity: str,
        compute: Callable[[DataFrame], DataFrame],
        target_path: str, state_path: str) -> int:
    """One materialization run; returns the number of recomputed
    buckets.  ``compute`` maps the (bucket-filtered) source to the
    target rows and must emit a ``__bucket`` column (the partition
    key of the target)."""
    import shutil

    fps = bucket_fingerprints(source, ts_col, granularity)
    changed = changed_buckets(spark, fps, state_path)
    buckets = [r["__bucket"] for r in changed.collect()]
    deleted = _deleted_buckets(spark, fps, state_path)
    for b in deleted:
        part_dir = os.path.join(
            target_path, f"__bucket={b.strftime('%Y-%m-%d-%H-%M')}")
        shutil.rmtree(part_dir, ignore_errors=True)
    if deleted and not buckets:
        # state must still drop the purged buckets
        fps.localCheckpoint(eager=True).write.mode("overwrite") \
            .parquet(state_path)
    if buckets:
        bucketed = source.withColumn(
            "__bucket", trunc_col(F.col(ts_col), granularity))
        subset = bucketed.filter(F.col("__bucket").isin(buckets))
        result = compute(subset)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (result.withColumn("__bucket", F.date_format(
            "__bucket", "yyyy-MM-dd-HH-mm"))
         .write.mode("overwrite").partitionBy("__bucket")
         .parquet(target_path))
        fps_out = fps.localCheckpoint(eager=True)
        fps_out.write.mode("overwrite").parquet(state_path)
    return len(buckets)


def read_target(spark: SparkSession, target_path: str) -> DataFrame:
    return spark.read.parquet(target_path).drop("__bucket")


def apply_changes_to_agg(stored_agg: DataFrame, changes: DataFrame,
                         group_cols: list[str], value_col: str,
                         n_col: str = "samples",
                         sum_col: str = "sum_value") -> DataFrame:
    """Maintain a (count, decimal-exact sum) aggregate from a row-level
    change feed (storage/snaptable.py::SnapTable.changes) instead of
    recomputing it: inserts/update-postimages add, deletes/update-
    preimages retract, and the signed per-group deltas full-outer-merge
    into the stored aggregate.  Groups whose count reaches zero drop
    out.

    COUNT and SUM are self-maintainable views (retraction = signed
    re-aggregation); the sums accumulate in DECIMAL so maintained ==
    recomputed bit-for-bit regardless of the order changes arrive in.
    At 100 TB the delta aggregation runs over |changed rows| and the
    merge join over |changed groups| — rerun cost is O(change volume),
    never O(table).
    """
    sign = (F.when(F.col("_change_type").isin("insert",
                                              "update_postimage"), 1)
            .when(F.col("_change_type").isin("delete",
                                             "update_preimage"), -1))
    delta = (changes.withColumn("__sign", sign)
             .groupBy(*group_cols)
             .agg(F.sum("__sign").cast("bigint").alias("__dn"),
                  F.sum(F.col("__sign")
                        * F.col(value_col).cast("decimal(28,4)"))
                  .alias("__dv")))
    merged = stored_agg.join(delta, group_cols, "full_outer")
    n = (F.coalesce(F.col(n_col), F.lit(0))
         + F.coalesce(F.col("__dn"), F.lit(0)))
    s = (F.coalesce(F.col(sum_col).cast("decimal(28,4)"),
                    F.lit(0).cast("decimal(28,4)"))
         + F.coalesce(F.col("__dv"), F.lit(0).cast("decimal(28,4)")))
    return (merged.select(*group_cols,
                          n.cast("bigint").alias(n_col),
                          s.cast("decimal(28,4)").alias(sum_col))
            .filter(F.col(n_col) > 0))
