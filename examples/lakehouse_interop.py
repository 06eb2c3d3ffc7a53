#!/usr/bin/env python
"""Lakehouse interop walkthrough: this engine speaking the Delta
protocol as a WRITER (partitioned, transactional) and reading its own
tables back through the format another engine would use — no Delta
jar anywhere.

  1. commit a Hive-partitioned Delta table (partition columns
     stripped from data files, string partitionValues in the log)
  2. exactly-once ingest: re-deliver a batch with the same
     txn=(app_id, version) — the setTransaction ledger skips it
  3. overwrite + time travel across versions
  4. publish a SnapTable snapshot as a Delta commit and read it via
     the plugin registry (the path a foreign Delta client would use)

Run: python examples/lakehouse_interop.py (writes under .scratch/lake)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.sources.plugins import get_plugin  # noqa: E402
from python_minerva_etl_spark.storage.delta import (DeltaTable,  # noqa: E402
                                                    read_delta)
from python_minerva_etl_spark.storage.snaptable import SnapTable  # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "lake")


def main() -> None:
    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark(app_name="lakehouse-interop")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. partitioned Delta commit
    delta_path = os.path.join(ROOT, "events_delta")
    t = DeltaTable(delta_path)
    batch0 = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 11.5),
         (3, "2024-01-02", 9.0)],
        "id long, day string, v double")
    v = t.write(spark, batch0, partition_by=["day"],
                txn=("ingest", 0))
    print(f"v{v}: partitioned commit; on-disk dirs:",
          sorted(d for d in os.listdir(delta_path)
                 if d.startswith("day=")))

    # 2. exactly-once: the SAME (app, version) re-delivered is a no-op
    v_again = t.write(spark, batch0, partition_by=["day"],
                      txn=("ingest", 0))
    assert v_again == v and read_delta(spark, delta_path).count() == 3
    print(f"re-delivered txn ('ingest', 0) skipped (still v{v_again},"
          " 3 rows)")
    t.write(spark, spark.createDataFrame(
        [(4, "2024-01-02", 7.25)], "id long, day string, v double"),
        txn=("ingest", 1))

    # 3. overwrite + time travel
    t.write(spark, spark.createDataFrame(
        [(9, "2024-02-01", 0.0)], "id long, day string, v double"),
        mode="overwrite", partition_by=["day"])
    print("current:", sorted(read_delta(spark, delta_path)
                             .select("id").toPandas()["id"]))
    print("as-of v1:", sorted(read_delta(spark, delta_path,
                                         version_as_of=1)
                              .select("id").toPandas()["id"]))

    # 4. SnapTable snapshot -> Delta publication -> plugin read
    st = SnapTable(os.path.join(ROOT, "snap"))
    st.merge(spark, spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 2.0)], "k long, seq long, v double"),
        ["k"], "seq")
    out = os.path.join(ROOT, "snap_delta")
    st.export_delta(spark, out)
    got = get_plugin("delta")(spark, out)
    print("published snapshot via Delta plugin:",
          sorted(tuple(r) for r in got.select("k", "v").collect()))
    spark.stop()


if __name__ == "__main__":
    main()
