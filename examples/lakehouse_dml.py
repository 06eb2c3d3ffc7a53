#!/usr/bin/env python
"""Delta lakehouse DML walkthrough — the full table lifecycle a
warehouse migration exercises, at toy scale, with no Delta jar:

  1. create a partitioned Delta table + enable the change data feed
  2. UPDATE (merge-on-read: DV mask + new files, cdc pre/post images)
  3. MERGE INTO (matched update + not-matched insert)
  4. DELETE, then read the full change feed
  5. RESTORE to an earlier version (forward commit, history intact)
  6. tail the table with Structured Streaming through the registered
     `minerva_delta` Python data source (commit-version offsets) and
     write the result back out through its exactly-once sink

Run: python examples/lakehouse_dml.py  (writes under .scratch/dml_demo)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.storage.delta import DeltaTable  # noqa: E402
from python_minerva_etl_spark.streaming.delta_source import (  # noqa: E402
    register_delta_source)

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "dml_demo")


def main() -> None:
    spark = get_spark("lakehouse-dml-demo")
    shutil.rmtree(ROOT, ignore_errors=True)
    table = os.path.join(ROOT, "accounts")
    dt = DeltaTable(table)

    # 1. create + CDF on
    dt.write(spark, spark.createDataFrame(
        [(1, "eu", 100.0), (2, "us", 200.0), (3, "eu", 300.0)],
        "id long, region string, balance double"),
        partition_by=["region"])
    dt.set_properties({"delta.enableChangeDataFeed": "true"})
    print("v0 table:")
    dt.read(spark).orderBy("id").show()

    # 2. UPDATE — only matched rows rewrite; files are DV-masked
    v_upd = dt.update(spark, {"balance": "balance * 1.05"},
                      "region = 'eu'")
    print(f"UPDATE committed v{v_upd} (5% interest for eu)")

    # 3. MERGE INTO — upsert a batch
    src = spark.createDataFrame(
        [(2, "us", 250.0), (4, "ap", 400.0)],
        "id long, region string, balance double")
    v_merge = dt.merge(
        spark, src, "t.id = s.id",
        when_matched_update={"balance": "s.balance"},
        when_not_matched_insert=True)
    print(f"MERGE committed v{v_merge}")

    # 4. DELETE + the change feed (cdc actions carry pre/post images)
    v_del = dt.delete(spark, "id = 1")
    print("change feed since the UPDATE:")
    (dt.changes(spark, v_upd)
     .orderBy("_commit_version", "_change_type", "id")
     .show(truncate=False))

    # 5. RESTORE back to the pre-merge state — a forward commit
    v_rst = dt.restore(spark, v_upd)
    print(f"RESTORE committed v{v_rst}; table now equals v{v_upd}:")
    dt.read(spark).orderBy("id").show()
    print("history still time-travels: rows at the post-delete "
          f"version v{v_del}:",
          dt.read(spark, v_del).count())

    # 6. stream the table through the registered data source into a
    # second Delta table, exactly-once
    register_delta_source(spark)
    mirror = os.path.join(ROOT, "mirror")
    q = (spark.readStream.format("minerva_delta")
         .option("startingVersion", 0)
         .option("ignoreChanges", "true").load(table)
         .writeStream.format("minerva_delta")
         .option("path", mirror)
         .option("checkpointLocation",
                 os.path.join(ROOT, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    print("mirror table (streamed through minerva_delta, "
          "duplicates from ignoreChanges deduped):")
    (DeltaTable(mirror).read(spark)
     .groupBy("id").agg(F.max("balance").alias("balance"))
     .orderBy("id").show())
    spark.stop()


if __name__ == "__main__":
    main()
