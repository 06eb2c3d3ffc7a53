#!/usr/bin/env python
"""Iceberg v2 lakehouse walkthrough — the full table lifecycle this
engine speaks without an Iceberg jar, at toy scale:

  1. create a table PARTITION BY days(ts) (the spec's day transform;
     manifest summaries land in the transformed domain, so ts-range
     reads prune whole manifests)
  2. append more days; run an INCREMENTAL append scan between
     snapshots (the IncrementalAppendScan contract)
  3. merge-on-read DML: DELETE (position-delete files), UPDATE
     (delete mask + rewritten rows, one overwrite snapshot), and
     MERGE INTO from a source dataframe
  4. schema evolution: append a batch carrying a NEW column
     (merge_schema=True) — old files read null
  5. time travel three ways: snapshot id, tag, and timestamp (every
     snapshot records timestamp-ms)
  6. maintenance: compaction absorbs the delete files; expiry
     physically removes unreachable ones
  7. the registered `minerva_iceberg` data source reads the same
     table through spark.read with filter pushdown

Run: python examples/iceberg_lakehouse.py  (writes under
.scratch/iceberg_demo)
"""

import datetime
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.storage.iceberg import (  # noqa: E402
    IcebergTable, read_iceberg, read_iceberg_incremental)
from python_minerva_etl_spark.storage.iceberg_write import (  # noqa: E402
    compact_iceberg, delete_iceberg, expire_snapshots, merge_iceberg,
    tag_iceberg, update_iceberg, write_iceberg)
from python_minerva_etl_spark.streaming.iceberg_source import (  # noqa: E402
    register_iceberg_source)

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "iceberg_demo")


def day(d: int, h: int = 0):
    return datetime.datetime(2024, 3, d, h)


def show(title: str, df) -> None:
    print(f"\n== {title}")
    df.orderBy("id").show(20, truncate=False)


def main() -> None:
    spark = get_spark("iceberg-demo")
    shutil.rmtree(ROOT, ignore_errors=True)
    p = os.path.join(ROOT, "events")

    # -- 1. create, partitioned by days(ts) ---------------------------
    write_iceberg(spark, spark.createDataFrame(
        [(1, day(1, 9), "login"), (2, day(1, 17), "click"),
         (3, day(2, 8), "click")],
        "id long, ts timestamp, kind string"), p,
        partition_by="days(ts)")
    tbl = IcebergTable(p)
    s1 = tbl.metadata()["current-snapshot-id"]
    tag_iceberg(p, "after-first-load")
    print("partition dirs:", sorted(
        e.name for e in os.scandir(os.path.join(p, "data"))
        if e.is_dir()))

    # -- 2. append + incremental scan ---------------------------------
    write_iceberg(spark, spark.createDataFrame(
        [(4, day(3, 11), "login"), (5, day(3, 12), "buy")],
        "id long, ts timestamp, kind string"), p,
        partition_by="days(ts)")
    show("incremental scan (records added after the first snapshot)",
         read_iceberg_incremental(spark, p, s1))

    # a day-range read prunes at the manifest level (transformed
    # domain) before any data file is opened
    show("ts >= Mar 3 (manifest-pruned read)",
         read_iceberg(spark, p, where=[("ts", ">=", day(3))]))

    # -- 3. merge-on-read DML -----------------------------------------
    n = delete_iceberg(spark, p, [("kind", "=", "click")])
    print(f"\nDELETE kind='click' -> {n} position-deleted rows "
          "(data files untouched)")
    n = update_iceberg(spark, p, {"kind": "upper(kind)"},
                       [("id", "=", 1)])
    print(f"UPDATE id=1 -> {n} row rewritten (one overwrite snapshot)")
    merge_iceberg(
        spark, p,
        spark.createDataFrame(
            [(5, day(3, 12), "refund"), (6, day(4, 10), "login")],
            "id long, ts timestamp, kind string"),
        "t.id = s.id",
        when_matched_update={"kind": "s.kind"},
        when_not_matched_insert=True)
    show("after DELETE / UPDATE / MERGE", read_iceberg(spark, p))

    # -- 4. add-column schema evolution -------------------------------
    write_iceberg(spark, spark.createDataFrame(
        [(7, day(4, 11), "buy", 42.5)],
        "id long, ts timestamp, kind string, amount double"), p,
        partition_by="days(ts)", merge_schema=True)
    show("after merge_schema append (old rows read amount=null)",
         read_iceberg(spark, p))

    # -- 5. time travel three ways ------------------------------------
    show("snapshot-id travel (first load)",
         read_iceberg(spark, p, snapshot_id=s1))
    show("tag travel (ref='after-first-load')",
         read_iceberg(spark, p, ref="after-first-load"))
    show("timestamp travel (as_of=now)",
         read_iceberg(spark, p, as_of=int(time.time() * 1000)))

    # -- 6. maintenance ------------------------------------------------
    sid = compact_iceberg(spark, p)
    print(f"\ncompacted into replace snapshot {sid} "
          "(delete files absorbed)")
    removed = expire_snapshots(p, keep_last=1)
    print(f"expire_snapshots removed {len(removed)} unreachable files")
    show("after compaction + expiry", read_iceberg(spark, p))

    # -- 7. the registered data source ---------------------------------
    register_iceberg_source(spark)
    df = (spark.read.format("minerva_iceberg").load(p)
          .filter(F.col("id") >= 5))
    show("spark.read.format('minerva_iceberg') with pushed filter",
         df)

    spark.stop()


if __name__ == "__main__":
    main()
