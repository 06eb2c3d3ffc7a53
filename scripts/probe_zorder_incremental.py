#!/usr/bin/env python
"""Incremental vs full Z-order maintenance cost as the CLUSTERED SET
grows — the claim under test: an incremental pass costs O(appended),
independent of how big the already-clustered table is, while a full
rewrite grows with table size.

For each base size K (files of the clustered set), build a Delta and
an Iceberg grid table, fully zorder it, append ONE fixed-size batch,
then time (a) the incremental pass and (b) a full rewrite from the
same state.  Prints one markdown table per format.

Usage: python scripts/probe_zorder_incremental.py [K ...]
Defaults: 4 16 64
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [4, 16, 64]
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.session import get_spark
    from python_minerva_etl_spark.storage.delta import DeltaTable
    from python_minerva_etl_spark.storage.iceberg_write import (
        compact_iceberg, write_iceberg)

    spark = get_spark(app_name="zorder-probe", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    rows_per_file = 50_000

    def grid(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 256).alias("x"),
            ((F.col("id") / 256).cast("long") % 256).alias("y"),
            F.col("id").alias("v"))

    print("| format | K files clustered | incremental s | full s |")
    print("|---|---|---|---|")
    base = tempfile.mkdtemp(prefix="zorder_probe_")
    try:
        for k in ks:
            n = k * rows_per_file
            # ---------- Delta ----------
            p = os.path.join(base, f"d{k}")
            dt = DeltaTable(p)
            dt.write(spark, grid(0, n).repartition(k))
            total = sum(f["size"] for f in dt._replay()["files"])
            tfb = max(1, total // k)
            dt.optimize(spark, target_file_bytes=tfb,
                        zorder_by=["x", "y"])
            dt.write(spark, grid(n, n + rows_per_file).coalesce(1))
            t0 = time.perf_counter()
            dt.optimize(spark, target_file_bytes=tfb,
                        zorder_by=["x", "y"], incremental=True)
            inc = time.perf_counter() - t0
            t0 = time.perf_counter()
            dt.optimize(spark, target_file_bytes=tfb,
                        zorder_by=["x", "y"])
            full = time.perf_counter() - t0
            print(f"| delta | {k} | {inc:.2f} | {full:.2f} |",
                  flush=True)
            # ---------- Iceberg ----------
            p = os.path.join(base, f"i{k}")
            write_iceberg(spark, grid(0, n).repartition(k), p)
            compact_iceberg(spark, p, zorder_by=["x", "y"],
                            target_file_bytes=tfb)
            write_iceberg(spark,
                          grid(n, n + rows_per_file).coalesce(1), p)
            t0 = time.perf_counter()
            compact_iceberg(spark, p, zorder_by=["x", "y"],
                            target_file_bytes=tfb,
                            incremental=True)
            inc = time.perf_counter() - t0
            t0 = time.perf_counter()
            compact_iceberg(spark, p, zorder_by=["x", "y"],
                            target_file_bytes=tfb)
            full = time.perf_counter() - t0
            print(f"| iceberg | {k} | {inc:.2f} | {full:.2f} |",
                  flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
