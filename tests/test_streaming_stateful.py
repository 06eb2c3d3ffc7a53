"""Stateful streaming (applyInPandasWithState) and incremental file
arrival (OP-STR-INGEST): state carries across micro-batches; a second
availableNow run over a grown inbox processes only the new files."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from python_minerva_etl_spark.registry import load_table

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "stateful")


def _stage_split(spark, inbox: str, parts: int = 2):
    """Split sf0.001 events into N files dropped into an inbox dir."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.count()
    per = rows // parts
    os.makedirs(inbox, exist_ok=True)
    paths = []
    for i in range(parts):
        lo, hi = i * per, (i + 1) * per if i < parts - 1 else rows
        part = ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        p = os.path.join(inbox, f"batch_{i}")
        part.write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths


def test_stateful_running_totals_across_batches(spark):
    from python_minerva_etl_spark.streaming.stateful import running_totals

    shutil.rmtree(SCRATCH, ignore_errors=True)
    inbox = os.path.join(SCRATCH, "inbox")
    _stage_split(spark, inbox, parts=2)

    schema = load_table(spark, "/root/testdata/sf0.001", "events").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")  # force multiple batches
              .parquet(os.path.join(inbox, "*")))
    result = running_totals(stream.select("user_id", "value"))
    q = (result.writeStream.format("memory").queryName("running_tot")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()
    # 'update' memory sink appends one row per key per batch; the final
    # state per user is the row with the highest n_events
    got = spark.sql("""
        SELECT user_id, max_by(n_events, n_events) AS n_events
        FROM running_tot GROUP BY user_id""").collect()
    want = {r.user_id: r.n
            for r in load_table(spark, "/root/testdata/sf0.001", "events")
            .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    got_map = {r.user_id: r.n_events for r in got}
    assert got_map == want  # state accumulated across micro-batches


def test_file_source_processes_only_new_files(spark):
    """Harvest-polling semantics: with a persistent checkpoint, a
    second availableNow run over a grown inbox reads only the new
    arrivals (incremental ingest, not a re-scan)."""
    shutil.rmtree(SCRATCH, ignore_errors=True)
    inbox = os.path.join(SCRATCH, "inbox2")
    sink = os.path.join(SCRATCH, "ingested")
    ckpt = os.path.join(SCRATCH, "ckpt2")
    paths = _stage_split(spark, inbox, parts=2)
    schema = load_table(spark, "/root/testdata/sf0.001", "events").schema

    staged = os.path.join(SCRATCH, "staged_batch_1")
    os.rename(paths[1], staged)  # only batch_0 in the inbox initially

    def run_once():
        stream = spark.readStream.schema(schema).parquet(
            os.path.join(inbox, "*"))
        q = (stream.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()

    run_once()
    n1 = pq.read_table(sink).num_rows if os.path.exists(sink) else 0
    os.rename(staged, paths[1])  # second file "arrives"
    run_once()
    n2 = spark.read.parquet(sink).count()
    total = load_table(spark, "/root/testdata/sf0.001", "events").count()
    assert 0 < n1 < total
    assert n2 == total  # second run added exactly the new file's rows


def test_streaming_anomalies_carry_baseline_across_batches(spark):
    """The streaming z-score twin judges each event against the
    running Welford baseline (no lookahead), carrying state across
    micro-batches: a pure-python replay over the same batches in the
    same order must reproduce the identical flag set bit-for-bit."""
    from python_minerva_etl_spark.streaming.stateful import \
        streaming_anomalies

    shutil.rmtree(SCRATCH, ignore_errors=True)
    inbox = os.path.join(SCRATCH, "inbox3")
    paths = _stage_split(spark, inbox, parts=2)

    schema = load_table(spark, "/root/testdata/sf0.001", "events").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(inbox, "*")))
    result = streaming_anomalies(
        stream.select("user_id", "event_id", "ts", "value"),
        z_threshold=2.5, min_samples=5)
    q = (result.writeStream.format("memory").queryName("stream_anom")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()
    got = {(r.user_id, r.event_id): r.z
           for r in spark.sql("SELECT * FROM stream_anom").collect()}

    # replay: same batches (mtime order = staging order), same
    # within-batch (ts, event_id) order, same Welford updates
    state: dict[int, tuple[int, float, float]] = {}
    want = {}
    for p in paths:
        batch = (spark.read.parquet(p)
                 .select("user_id", "event_id", "ts", "value")
                 .orderBy("ts", "event_id").collect())
        by_user: dict[int, list] = {}
        for r in batch:
            by_user.setdefault(r.user_id, []).append(r)
        for uid, rows in by_user.items():
            n, mean, m2 = state.get(uid, (0, 0.0, 0.0))
            for r in rows:
                v = float(r.value)
                if n >= 5:
                    std = (m2 / (n - 1)) ** 0.5
                    if std > 0.0:
                        z = (v - mean) / std
                        if abs(z) > 2.5:
                            want[(uid, r.event_id)] = z
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
            state[uid] = (n, mean, m2)

    assert set(got) == set(want)
    assert all(got[k] == want[k] for k in got)  # bit-identical z
    assert len(got) > 0  # the fixture does produce outliers


def test_stream_anomaly_flags_match_batch_prefix_twin(spark):
    """The declared rows-only streaming feed and the oracle-backed
    batch prefix z-score flag the SAME events at sf0.001 — the
    Welford float path and the decimal prefix sums disagree only in
    ulps, never across the |z|>3 boundary on this data."""
    from python_minerva_etl_spark.queries.catalog import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    batch = {r.event_id for r in
             qs["anomaly_prefix_zscore"].spark(spark, sf).collect()}
    stream = {r.event_id for r in
              qs["stream_anomaly_feed"].spark(spark, sf).collect()}
    assert batch == stream
    assert len(batch) > 0
