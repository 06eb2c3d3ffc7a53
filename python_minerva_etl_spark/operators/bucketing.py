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

import math
import os

from pyspark.sql import DataFrame, SparkSession


def derive_num_buckets(path: str, target_bytes: int = 16 << 20,
                       floor: int = 16, cap: int = 4096) -> int:
    """Scale-adaptive bucket count from the source's on-disk bytes:
    next power of two of size/target, clamped to [floor, cap].  A
    constant bucket count is tuned for exactly one scale — 16 buckets
    that are fine at sf0.1 cap the 100x join at 16-way parallelism
    (measured: the bucketed rollup LOST to the shuffled plan there,
    14.7 vs 12.8 s, because 16 tasks ran on 32 cores with no AQE
    split).  Power of two keeps co-join compatibility stepwise (equal
    counts still required across co-bucketed tables — derive from the
    same driving table).  ``target_bytes`` is compressed parquet per
    bucket; at 100 TB and the 128 MB guide target this lands in the
    tens of thousands of buckets, as the module docstring prescribes.
    """
    size = 0
    if os.path.isfile(path):
        size = os.path.getsize(path)
    else:
        for root, _dirs, files in os.walk(path):
            size += sum(os.path.getsize(os.path.join(root, f))
                        for f in files if not f.startswith((".", "_")))
    if size <= 0:
        return floor
    raw = max(1, math.ceil(size / target_bytes))
    return max(floor, min(cap, 1 << math.ceil(math.log2(raw))))


def ensure_bucketed_table(spark: SparkSession, table: str,
                          df: DataFrame, keys: list[str],
                          num_buckets: int,
                          sort_cols: list[str] | None = None) -> None:
    """Build ``table`` from ``df`` bucketed on ``keys`` unless the
    session catalog already has it (build-once-per-session: re-runs
    against the same fixture reuse the layout; the bench's warmups
    pay the build).  A fresh session's in-memory catalog cannot see a
    managed LOCATION left by a prior session, so a stale location is
    cleared first — guarded to never delete outside the session
    warehouse root."""
    if spark.catalog.tableExists(table):
        return
    import shutil
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, table.lower())
    real_loc, real_wh = os.path.realpath(loc), os.path.realpath(wh)
    if real_loc == real_wh or \
            not real_loc.startswith(real_wh + os.sep):
        raise RuntimeError(
            f"refusing to clear {loc!r}: not under warehouse {wh!r}")
    if os.path.exists(loc):
        shutil.rmtree(loc)
    write_bucketed(df, table, keys, num_buckets, sort_cols=sort_cols)


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
