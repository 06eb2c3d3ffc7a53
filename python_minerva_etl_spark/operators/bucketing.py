"""Bucketed storage — co-located joins and aggregations without a
shuffle (the 100 TB join strategy).

Reference context: Minerva stores trend data keyed by
(entity_id, timestamp) in PostgreSQL partitions; every rollup joins
and re-aggregates on entity_id.  PG gets locality from indexes; the
Spark analog is *bucketing*: hash-cluster each table into N buckets
on its join/agg key at write time.  Two tables bucketed into the
same N on the same key join with ZERO exchange — at 100 TB the
nightly rollup joins become scan+join, no terabyte shuffles — and
``groupBy`` on the bucket key skips its exchange too.

Bucketing requires a table catalog (``saveAsTable``); the session's
default warehouse (or an explicit ``path`` per table) holds the
files.  Pick N so a bucket of the biggest table fits an executor
core's working set (at 100 TB and ~128 MB targets that's tens of
thousands of buckets; N must match across tables meant to co-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   num_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) table.

    ``sort_cols`` additionally sorts within each bucket file — joins
    and window functions over (keys, sort_cols) then skip their sort
    as well (sort-merge join reads presorted runs).
    """
    writer = (df.write.mode(mode).format("parquet")
              .bucketBy(num_buckets, *keys))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table)
