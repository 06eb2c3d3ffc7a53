#!/usr/bin/env python
"""Streaming CDC-upsert into Iceberg with BLIND equality deletes —
the Flink/Paimon writer shape, at toy scale.

A CDC feed carrying upserts and deletes lands in an Iceberg v2 table
WITHOUT ever scanning it:

  1. bootstrap an append-only base table
  2. a CDC batch's deletes commit as ONE equality-delete file
     (``equality_delete_iceberg`` — O(|keys|) regardless of table
     size; the reader applies them as broadcast anti joins)
  3. the same batch's upserts commit as a plain append — the
     equality delete has a SMALLER sequence number, so the new rows
     survive it (re-insert-after-delete is the whole point of
     sequence-ordered equality deletes)
  4. read back through BOTH the library reader and the registered
     ``minerva_iceberg`` data source (which applies equality deletes
     executor-side) and assert they agree
  5. ``compact_iceberg`` absorbs the delete files into fresh data
     files once the delete debt is worth paying down

Run: python examples/cdc_upsert_iceberg.py
     (writes under .scratch/cdc_upsert_demo)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.storage.iceberg import (  # noqa: E402
    IcebergTable, read_iceberg)
from python_minerva_etl_spark.storage.iceberg_write import (  # noqa: E402
    compact_iceberg, equality_delete_iceberg, write_iceberg)
from python_minerva_etl_spark.streaming.iceberg_source import (  # noqa: E402
    register_iceberg_source)

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "cdc_upsert_demo")


def main() -> None:
    spark = get_spark(app_name="cdc-upsert-demo",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    register_iceberg_source(spark)
    shutil.rmtree(ROOT, ignore_errors=True)
    tbl = os.path.join(ROOT, "accounts")

    # 1. bootstrap
    write_iceberg(spark, spark.createDataFrame(
        [(1, "alice", 100), (2, "bob", 200), (3, "carol", 300),
         (4, "dave", 400)],
        "id long, name string, balance long"), tbl)
    print("base:", sorted(r.id for r in
                          read_iceberg(spark, tbl).collect()))

    # 2. CDC batch: delete ids 2,3 — ONE blind commit, no scan
    equality_delete_iceberg(
        spark, tbl, spark.createDataFrame([(2,), (3,)], "id long"))

    # 3. ... and upsert id=3 (the re-insert survives the delete:
    # its data file has a HIGHER sequence number)
    write_iceberg(spark, spark.createDataFrame(
        [(3, "carol", 333), (5, "erin", 500)],
        "id long, name string, balance long"), tbl)

    lib = {r.id: r.balance for r in read_iceberg(spark, tbl).collect()}
    src = {r.id: r.balance
           for r in spark.read.format("minerva_iceberg")
           .load(tbl).collect()}
    assert lib == src == {1: 100, 3: 333, 4: 400, 5: 500}, (lib, src)
    print("after cdc batch:", dict(sorted(lib.items())))

    # 4. metadata shows the delete file carrying equality_ids
    t = IcebergTable(tbl)
    _files, deletes = t._data_files(t._snapshot(t.metadata(), None))
    eq = [d for d in deletes if d.get("content") == 2]
    print(f"equality-delete files: {len(eq)} "
          f"(equality_ids={eq[0]['equality_ids']})")

    # 5. compaction absorbs the delete debt
    compact_iceberg(spark, tbl)
    t = IcebergTable(tbl)
    _files, deletes = t._data_files(t._snapshot(t.metadata(), None))
    assert not deletes
    after = {r.id: r.balance
             for r in read_iceberg(spark, tbl).collect()}
    assert after == lib
    print("compacted: 0 delete files, rows unchanged")
    spark.stop()


if __name__ == "__main__":
    main()
