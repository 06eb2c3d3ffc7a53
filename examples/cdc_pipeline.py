#!/usr/bin/env python
"""Snapshot-table CDC walkthrough: the incremental-maintenance loop a
100 TB deployment runs nightly, at toy scale.

  1. MERGE two load batches into a snapshot-committed table
     (atomic manifests, file-pruned rewrites)
  2. read the row-level change feed between the two versions
  3. maintain a downstream aggregate FROM the feed (signed
     re-aggregation — cost O(changes), never a table rescan)
  4. keyed DELETE (right-to-erasure) — surfaces as CDC deletes,
     and the maintained aggregate absorbs them the same way
  5. OPTIMIZE — bin-pack fragmented files; CDC-invisible

Run: python examples/cdc_pipeline.py   (writes under .scratch/cdc_demo)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_minerva_etl_spark.operators.materialization import (  # noqa: E402
    apply_changes_to_agg)
from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.storage.snaptable import SnapTable  # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "cdc_demo")


def main() -> None:
    spark = get_spark("cdc-demo")
    shutil.rmtree(ROOT, ignore_errors=True)
    tbl = SnapTable(ROOT)

    # -- 1. two MERGE batches (second replaces overlapping keys) ------
    b1 = spark.createDataFrame(
        [(1, "2024-01-01", 10.0, 1), (2, "2024-01-01", 20.0, 1),
         (3, "2024-01-01", 30.0, 1)],
        "entity long, day string, value double, seq long")
    b2 = spark.createDataFrame(
        [(2, "2024-01-01", 25.0, 2), (4, "2024-01-01", 40.0, 2)],
        "entity long, day string, value double, seq long")
    tbl.merge(spark, b1, ["entity", "day"], "seq")
    tbl.merge(spark, b2, ["entity", "day"], "seq")
    print("history:", tbl.history())

    # -- 2. the change feed v1 -> v2 ---------------------------------
    feed = tbl.changes(spark, 1, 2)
    print("changes v1->v2:")
    feed.orderBy("entity", "_change_type").show()

    # -- 3. maintain a per-day aggregate from the feed ---------------
    agg_v1 = (tbl.read(spark, 1).groupBy("day")
              .agg(F.count("*").alias("samples"),
                   F.sum(F.col("value").cast("decimal(28,4)"))
                   .cast("decimal(28,4)").alias("sum_value")))
    maintained = apply_changes_to_agg(agg_v1, feed, ["day"], "value")
    print("maintained aggregate (== recompute over v2):")
    maintained.show()

    # -- 4. keyed DELETE ---------------------------------------------
    tbl.delete(spark, spark.createDataFrame(
        [(3, "2024-01-01")], "entity long, day string"),
        ["entity", "day"])
    print("after delete:", sorted(
        r.entity for r in tbl.read(spark).collect()))
    print("delete feed v2->v3:")
    tbl.changes(spark, 2, 3).show()

    # -- 5. OPTIMIZE: layout-only, CDC-invisible ---------------------
    v = tbl.optimize(spark, small_file_bytes=32 << 20)
    if v is not None:
        print(f"optimize -> v{v}; changes v{v - 1}->v{v}:",
              tbl.changes(spark, v - 1, v).count(), "(expect 0)")
    spark.stop()


if __name__ == "__main__":
    main()
