#!/usr/bin/env python
"""The Avro DROP DIRECTORY loop — the 100 TB ingest entry point,
end to end through the registered `minerva_avro` data source:

  1. an upstream producer appends object-container files to a drop
     directory (here: the batch writer, whose part-file seqs climb a
     monotonic ladder — append order survives clock regression and
     concurrent jobs)
  2. a Structured Streaming query TAILS the directory: offsets are
     name ranges over the sorted file names, every file is processed
     exactly once, each file shatters into sync-marker byte-range
     splits so parallelism is independent of file count
  3. the query lands its output in a SECOND drop directory through
     the streaming SINK, whose micro-batches become visible
     atomically via `.batch-<id>.committed` ledger markers — a
     crash between renames is invisible to readers and replays
     exactly once
  4. a downstream batch read of the sink directory sees only
     committed batches; the zstandard codec keeps the archive small
     (the full Avro 1.11 codec set is supported)

Run: python examples/avro_drop_directory.py
     (writes under .scratch/avro_drop_demo)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_minerva_etl_spark.session import get_spark  # noqa: E402
from python_minerva_etl_spark.sources.avro import read_avro  # noqa: E402
from python_minerva_etl_spark.streaming.avro_source import (  # noqa: E402
    register_avro_source)


def main() -> None:
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", ".scratch", "avro_drop_demo")
    base = os.path.abspath(base)
    shutil.rmtree(base, ignore_errors=True)
    inbox = os.path.join(base, "inbox")      # producer drops here
    archive = os.path.join(base, "archive")  # stream sink lands here
    ckpt = os.path.join(base, "ckpt")

    spark = get_spark(app_name="avro-drop-demo")
    spark.sparkContext.setLogLevel("ERROR")
    register_avro_source(spark)

    # -- 1. producer: two append jobs into the inbox ---------------
    for lo, hi in ((0, 500), (500, 900)):
        df = spark.createDataFrame(
            [(i, f"sensor-{i % 7}", float(i) * 0.5)
             for i in range(lo, hi)],
            "id long, source string, v double")
        (df.repartition(2).write.format("minerva_avro")
         .mode("append").save(inbox))
    n_inbox = len([f for f in os.listdir(inbox)
                   if f.endswith(".avro")])
    print(f"inbox: {n_inbox} container files")

    # -- 2.+3. tail the inbox, land in the archive (zstandard) -----
    def run_stream():
        q = (spark.readStream.format("minerva_avro")
             .option("split_bytes", 1 << 20).load(inbox)
             .withColumn("v2", F.col("v") * 2)
             .writeStream.format("minerva_avro")
             .option("path", archive)
             .option("codec", "zstandard")
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    run_stream()
    ledgers = [f for f in os.listdir(archive)
               if f.startswith(".batch-")]
    print(f"archive: committed batch ledgers = {sorted(ledgers)}")

    # -- producer keeps dropping; the CHECKPOINTED stream resumes --
    (spark.createDataFrame(
        [(i, f"sensor-{i % 7}", float(i) * 0.5)
         for i in range(900, 1000)],
        "id long, source string, v double")
     .coalesce(1).write.format("minerva_avro")
     .mode("append").save(inbox))
    run_stream()

    # -- 4. downstream batch read sees exactly the committed rows --
    got = read_avro(spark, archive)
    total = got.count()
    assert total == 1000, total
    assert got.filter("v2 <> v * 2").count() == 0
    print(f"archive rows: {total} (exactly once, all transformed)")

    per_source = (got.groupBy("source")
                  .agg(F.count("*").alias("n"),
                       F.sum("v2").alias("sum_v2"))
                  .orderBy("source"))
    per_source.show()
    spark.stop()


if __name__ == "__main__":
    main()
