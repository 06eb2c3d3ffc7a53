"""Small-file compaction for partitioned parquet stores.

Every incremental load (plans/load.py, operators/upsert.py) appends a
few files per touched partition; after thousands of loads a partition
holds thousands of KB-sized files and scan planning + open() overhead
dominate read cost — the classic small-file problem every long-running
100 TB store hits.  Compaction bin-packs each partition back to
``ceil(bytes / target_file_bytes)`` files.

The rewrite reuses the upsert staging discipline: write the compacted
copy to a sibling staging dir, then swap with directory renames,
retiring the old copy OUTSIDE the table dir so a reader racing the
swap never double-discovers.  Untouched partitions are never read or
moved, so routine compaction of a 100 TB store only processes the
partitions that actually fragmented.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _dir_stats(d: str) -> tuple[int, int]:
    files = [os.path.join(dp, f)
             for dp, _dirs, fs in os.walk(d) for f in fs
             if f.endswith(".parquet")]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_store(spark: SparkSession, path: str,
                  partition_col: str | None = None,
                  target_file_bytes: int = 128 << 20,
                  min_files: int = 2) -> dict:
    """Compact the parquet table at ``path`` (hive-partitioned on
    ``partition_col`` if given).  Returns per-table stats:
    ``{"units_seen", "units_compacted", "files_before", "files_after"}``.

    A unit (partition dir, or the whole table when unpartitioned) is
    compacted only when it holds >= ``min_files`` files AND fewer
    output files would result — compaction is idempotent and cheap to
    re-run on an already-compact store.
    """
    if partition_col is None:
        units = [path]
    else:
        units = [os.path.join(path, e) for e in sorted(os.listdir(path))
                 if e.startswith(f"{partition_col}=")]
    stats = {"units_seen": len(units), "units_compacted": 0,
             "files_before": 0, "files_after": 0}
    for unit in units:
        n_files, n_bytes = _dir_stats(unit)
        stats["files_before"] += n_files
        n_out = max(1, math.ceil(n_bytes / target_file_bytes))
        if n_files < min_files or n_out >= n_files:
            stats["files_after"] += n_files
            continue
        df = spark.read.parquet(unit)
        staging = f"{path}.__compact__{uuid.uuid4().hex[:8]}"
        try:
            # coalesce, not repartition: bin-packing needs no shuffle
            df.coalesce(n_out).write.mode("overwrite").parquet(staging)
            retired = f"{path}.__retired__{uuid.uuid4().hex[:8]}"
            os.rename(unit, retired)
            os.rename(staging, unit)
            shutil.rmtree(retired)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        stats["units_compacted"] += 1
        stats["files_after"] += _dir_stats(unit)[0]
    return stats
