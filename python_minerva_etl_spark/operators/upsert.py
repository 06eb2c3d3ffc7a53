"""Keyed upsert — last-writer-wins on (entity, timestamp).

Reference semantics (trendstorepart store logic [U]):
``INSERT … ON CONFLICT (entity_id, timestamp) DO UPDATE`` — later
loads replace earlier values for the same key.

Spark mapping (OP-SNK-UPSERT) on plain parquet:
1. resolve last-writer-wins against only the *touched* partitions:
   ``row_number() over (partition by key order by src desc, seq desc)
   = 1``;
2. stage the resolved output to a sibling ``path.__staging__`` dir,
   then swap directories into place (per touched partition when
   partitioned, whole table otherwise).  The swap is two renames —
   the stored table is never deleted before its replacement exists,
   and nothing is pinned in executor memory.  At 100 TB a load
   touches a few recent partitions; the table is never rewritten.
   (A table format with MERGE — Delta/Iceberg — slots in behind the
   same function and is the answer for concurrent writers / object
   stores where rename is not atomic.)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def argmax_resolve(df: DataFrame, key: list[str],
                   order_cols: list[str]) -> DataFrame:
    """Keep the row with the largest ``order_cols`` tuple per key, as
    ONE aggregation (``max_by`` over a struct) instead of a window
    ``row_number``: the aggregate gets partial (map-side) reduction,
    so the exchange carries one row per key per map task instead of
    every duplicate — the window shuffles ALL rows, then sorts.  (The
    struct-typed buffer makes Spark plan SortAggregate rather than
    HashAggregate, so a local sort by grouping key remains on each
    side; the shuffled-bytes reduction is the win, and the measured
    sf0.1 medians improved too: upsert_last_wins 0.61 -> ~0.5 s.)
    Semantics match ``row_number() ... ORDER BY cols DESC == 1``
    exactly: a NULL inside the ordering struct sorts lowest (= NULLS
    LAST under DESC), ties pick an arbitrary row (both forms do;
    callers pass a unique sequence for determinism), and an all-NULL
    ordering tuple still keeps one row (the struct itself is never
    NULL, so ``max_by`` cannot drop the group)."""
    others = [c for c in df.columns if c not in key]
    row = F.max_by(F.struct(*[F.col(c) for c in others]),
                   F.struct(*[F.col(c) for c in order_cols]))
    picked = df.groupBy(*key).agg(row.alias("__r"))
    return picked.select(*[
        F.col(c) if c in key else F.col("__r").getField(c).alias(c)
        for c in df.columns])


def dedup_last_wins(df: DataFrame, key: list[str], seq_col: str) -> DataFrame:
    """Keep the highest-``seq_col`` row per key (deterministic: seq must
    be unique per key, e.g. a batch sequence number or load id)."""
    return argmax_resolve(df, key, [seq_col])


def upsert_parquet(spark: SparkSession, batch: DataFrame, path: str,
                   key: list[str], seq_col: str,
                   partition_col: str | None = None) -> None:
    """Upsert ``batch`` into the parquet table at ``path``.

    Conflict resolution matches the reference's ``ON CONFLICT DO
    UPDATE``: the INCOMING batch always replaces the stored row for the
    same key, regardless of sequence numbers (the source tag outranks
    ``seq_col``).  ``seq_col`` breaks ties *within* one batch only —
    it need not be comparable across loads (load_data uses a per-batch
    monotonic id).  Replaying an old batch therefore re-applies it,
    exactly as re-running a COPY+upsert does in the reference.

    The resolved output is written to a staging dir and swapped in with
    directory renames, because the resolve plan *reads* ``path`` — a
    direct overwrite would delete its own input (and a mid-write crash
    would lose the table).  The stored table stays intact until its
    replacement is fully written; no whole-table ``localCheckpoint``.
    """
    if not os.path.exists(path):
        resolved = dedup_last_wins(batch, key, seq_col)
        writer = resolved.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(path)
        return

    existing = spark.read.parquet(path)
    if partition_col is not None:
        parts = [r[0] for r in
                 batch.select(partition_col).distinct().collect()]
        existing = existing.filter(F.col(partition_col).isin(parts))
    combined = existing.withColumn("__src", F.lit(0)).unionByName(
        batch.withColumn("__src", F.lit(1)), allowMissingColumns=True)
    resolved = argmax_resolve(combined, key,
                              ["__src", seq_col]).drop("__src")

    staging = f"{path}.__staging__{uuid.uuid4().hex[:8]}"
    try:
        writer = resolved.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(staging)

        if partition_col is None:
            retired = f"{path}.__retired__{uuid.uuid4().hex[:8]}"
            os.rename(path, retired)
            os.rename(staging, path)
            shutil.rmtree(retired)
        else:
            # swap only the partition dirs the batch touched; untouched
            # partitions are never read, rewritten, or moved
            for entry in os.listdir(staging):
                if not entry.startswith(f"{partition_col}="):
                    continue
                src = os.path.join(staging, entry)
                dst = os.path.join(path, entry)
                if os.path.exists(dst):
                    # retire OUTSIDE the table dir so a reader racing
                    # the swap never partition-discovers the old copy
                    retired = (f"{path}.__retired__{uuid.uuid4().hex[:8]}")
                    os.rename(dst, retired)
                    os.rename(src, dst)
                    shutil.rmtree(retired)
                else:
                    os.rename(src, dst)
            shutil.rmtree(staging)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
