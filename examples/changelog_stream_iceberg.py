#!/usr/bin/env python
"""Maintaining a downstream aggregate from an Iceberg UPSERT table
via the CHANGELOG streaming source — the consumer half of the
Flink/Paimon CDC story (`examples/cdc_upsert_iceberg.py` is the
producer half).

  1. a producer keeps an upsert table current: appends + blind
     equality deletes (never a table scan)
  2. `option("changelog", "true")` on the registered streaming
     source tails the snapshot chain as a RETRACTION feed —
     appends emit `_change_type='insert'`, delete snapshots emit
     the full PRE-IMAGES of the killed rows as 'delete'
  3. a foreachBatch consumer maintains a per-group SUM/COUNT by
     SIGNED re-aggregation — |changed rows| of work per trigger,
     never a rescan of the table
  4. the maintained aggregate is asserted equal to a from-scratch
     aggregate of the final snapshot
  5. the same foreachBatch runs the compaction policy
     (`maybe_compact_iceberg`) so the delete debt stays bounded

Run: python examples/changelog_stream_iceberg.py
     (writes under .scratch/changelog_demo)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.storage.iceberg import (  # noqa: E402
    read_iceberg)
from python_minerva_etl_spark.storage.iceberg_write import (  # noqa: E402
    equality_delete_iceberg, maybe_compact_iceberg, write_iceberg)
from python_minerva_etl_spark.streaming.iceberg_source import (  # noqa: E402
    register_iceberg_source)

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "changelog_demo")


def main() -> None:
    spark = get_spark(app_name="changelog-demo",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    register_iceberg_source(spark)
    shutil.rmtree(ROOT, ignore_errors=True)
    table = os.path.join(ROOT, "upsert_table")

    # 1. producer: base rows, then two CDC epochs (delete + upsert)
    write_iceberg(spark, spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(30)],
        "id long, grp string, v double"), table)
    equality_delete_iceberg(spark, table, spark.createDataFrame(
        [(i,) for i in range(0, 30, 5)], "id long"))
    write_iceberg(spark, spark.createDataFrame(
        [(5, "g9", 500.0), (100, "g9", 1.0)],
        "id long, grp string, v double"), table)

    # 2-3. consumer: tail the changelog, maintain sum/count by
    # signed re-aggregation into a plain dict (stand-in for any
    # keyed sink), and run the compaction policy each trigger
    state: dict[str, list[float]] = {}

    def apply_batch(batch_df, batch_id):
        sgn = F.when(F.col("_change_type") == "insert", 1) \
            .otherwise(-1)
        rows = (batch_df.groupBy("grp")
                .agg(F.sum(sgn * F.col("v")).alias("dv"),
                     F.sum(sgn).alias("dn")).collect())
        for r in rows:
            acc = state.setdefault(r.grp, [0.0, 0])
            acc[0] += r.dv
            acc[1] += r.dn
        maybe_compact_iceberg(spark, table, max_delete_files=4)

    q = (spark.readStream.format("minerva_iceberg")
         .option("changelog", "true").load(table)
         .writeStream.foreachBatch(apply_batch)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    # 4. parity with a from-scratch aggregate
    fresh = {r.grp: (r.sv, r.n) for r in
             read_iceberg(spark, table).groupBy("grp")
             .agg(F.sum("v").alias("sv"),
                  F.count("*").alias("n")).collect()}
    maintained = {g: (round(v, 6), int(n))
                  for g, (v, n) in state.items() if n}
    assert maintained == {g: (round(v, 6), n)
                          for g, (v, n) in fresh.items()}, \
        (maintained, fresh)
    print("maintained aggregate ==", maintained)
    print("changelog consumer parity: OK")
    spark.stop()


if __name__ == "__main__":
    main()
