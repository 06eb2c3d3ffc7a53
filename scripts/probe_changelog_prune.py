#!/usr/bin/env python
"""Changelog delete-epoch pruning probe (r8 verdict #3): show that a
delete epoch's planned pre-image partitions — and the feed's
wall-clock — track the number of TOUCHED files, not table size.

Builds tables of F single-file appends with disjoint id ranges, adds
one 1-key equality-delete epoch, and reports the delete partitions
planned and the changelog runtime as F grows.

Usage: python scripts/probe_changelog_prune.py [F ...]   (default 4 16 64)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [4, 16, 64]

    from python_minerva_etl_spark.session import get_spark
    from python_minerva_etl_spark.storage.iceberg_write import (
        equality_delete_iceberg, write_iceberg)
    from python_minerva_etl_spark.streaming.iceberg_source import (
        _IceChangelogBatchReader, register_iceberg_source)

    spark = get_spark(app_name="changelog-prune-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_iceberg_source(spark)
    print("| files | delete partitions planned | plan s | feed s |")
    print("|---|---|---|---|")
    for f_count in sizes:
        p = f"/tmp/probe_cl_prune_{f_count}"
        shutil.rmtree(p, ignore_errors=True)
        for k in range(f_count):
            write_iceberg(spark, spark.createDataFrame(
                [(k * 1000 + i, float(i)) for i in range(200)],
                "id long, v double").coalesce(1), p)
        # one key, living in the middle file only
        mid = (f_count // 2) * 1000 + 7
        equality_delete_iceberg(spark, p, spark.createDataFrame(
            [(mid,)], "id long"))
        t0 = time.perf_counter()
        parts = _IceChangelogBatchReader({"path": p}).partitions()
        t_plan = time.perf_counter() - t0
        n_del = sum(1 for q in parts if q.kind == "delete")
        t0 = time.perf_counter()
        qname = f"cl_probe_{f_count}"
        q = (spark.readStream.format("minerva_iceberg")
             .option("changelog", "true").load(p)
             .writeStream.format("memory").queryName(qname)
             .outputMode("append").trigger(availableNow=True)
             .start())
        q.awaitTermination(300)
        n = spark.table(qname).filter(
            "_change_type = 'delete'").count()
        t_feed = time.perf_counter() - t0
        assert n == 1, n
        print(f"| {f_count} | {n_del} | {t_plan:.3f} | "
              f"{t_feed:.2f} |", flush=True)
        shutil.rmtree(p, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
