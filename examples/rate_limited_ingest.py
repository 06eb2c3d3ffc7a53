#!/usr/bin/env python
"""Admission-controlled drop-directory ingest — a live `minerva_avro`
stream draining a producer burst in BOUNDED micro-batches:

  1. a producer drops Avro container files into a directory (the
     Kafka-archive shape) — deliberately bursty
  2. the stream runs with maxFilesPerTrigger=2: each trigger plans
     at most 2 new files however deep the backlog got (bounded task
     count, bounded executor memory, steady checkpoint cadence)
  3. per-batch input sizes are printed from the query progress —
     the burst drains as 2-file steps, and every row arrives
     exactly once

The first batch of a query's FIRST run is uncapped: the Python
DataSource API exposes no ReadLimit hook and calls latestOffset
before revealing any start offset; an artificially low first offset
would regress Spark's offset log and double-read after a crash.
The cap governs every later trigger — and with
``option("admissionStateDir", dir)`` (added round 10) the watermark
persists across RESTARTS too, so a restarted query drains a
piled-up backlog in capped batches from micro-batch zero
(tests/test_admission_state.py proves it end-to-end).

Run: python examples/rate_limited_ingest.py
     (writes under .scratch/ratelimit_demo)
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.streaming.avro_source import (  # noqa: E402
    register_avro_source)

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", ".scratch", "ratelimit_demo")


def main():
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="ratelimit-demo",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_avro_source(spark)
    drop = os.path.join(BASE, "drop")

    def produce(lo, hi):
        (spark.range(lo, hi).select(F.col("id"),
                                    (F.col("id") % 7).alias("k"))
         .coalesce(1).write.format("minerva_avro")
         .mode("append").save(drop))

    produce(0, 100)  # one file present at start
    q = (spark.readStream.format("minerva_avro")
         .option("maxFilesPerTrigger", "2").load(drop)
         .writeStream.format("memory").queryName("ingest")
         .outputMode("append")
         .trigger(processingTime="300 milliseconds").start())
    try:
        while spark.table("ingest").count() < 100:
            time.sleep(0.3)
        # the BURST: 8 files land while the stream is live
        for i in range(1, 9):
            produce(i * 100, (i + 1) * 100)
        deadline = time.time() + 120
        while (spark.table("ingest").count() < 900
               and time.time() < deadline):
            time.sleep(0.3)
        time.sleep(1)
        rows = spark.table("ingest").count()
        steps = [(int(p["batchId"]), int(p["numInputRows"]))
                 for p in q.recentProgress
                 if int(p["numInputRows"]) > 0]
        print(f"rows ingested: {rows} (exactly once)")
        print(f"non-empty batches: {steps}")
        burst = [n for b, n in steps if b >= 1]
        print(f"burst drained in steps of <= 200 rows "
              f"(2 files): max step {max(burst)}")
        assert rows == 900 and max(burst) <= 200
    finally:
        q.stop()
        spark.stop()


if __name__ == "__main__":
    main()
