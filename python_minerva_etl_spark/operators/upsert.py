"""Keyed upsert — last-writer-wins on (entity, timestamp).

Reference semantics (trendstorepart store logic [U]):
``INSERT … ON CONFLICT (entity_id, timestamp) DO UPDATE`` — later
loads replace earlier values for the same key.

Spark mapping (OP-SNK-UPSERT) on plain parquet:
1. dedup-last within the combined batch: ``row_number() over
   (partition by key order by seq desc) = 1``;
2. write with *dynamic partition overwrite* — only the time partitions
   present in the batch are rewritten.  At 100 TB a load touches a few
   recent partitions; the table is never rewritten.  (A table format
   with MERGE — Delta/Iceberg — slots in behind the same function.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_last_wins(df: DataFrame, key: list[str], seq_col: str) -> DataFrame:
    """Keep the highest-``seq_col`` row per key (deterministic: seq must
    be unique per key, e.g. a batch sequence number or load id)."""
    w = Window.partitionBy(*key).orderBy(F.desc(seq_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


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
    """
    import os

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        if partition_col is not None:
            parts = [r[0] for r in
                     batch.select(partition_col).distinct().collect()]
            existing = existing.filter(F.col(partition_col).isin(parts))
        combined = existing.withColumn("__src", F.lit(0)).unionByName(
            batch.withColumn("__src", F.lit(1)), allowMissingColumns=True)
        w = Window.partitionBy(*key).orderBy(
            F.desc("__src"), F.desc(seq_col))
        resolved = (combined.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn", "__src"))
        # materialize before writing — Spark refuses to overwrite a
        # path that is an input of the (lazy) plan being written
        resolved = resolved.localCheckpoint(eager=True)
    else:
        resolved = dedup_last_wins(batch, key, seq_col)
    writer = resolved.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(path)
