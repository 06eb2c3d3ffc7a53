"""Streaming paths beyond the declared parity query: the stateful
trigger evaluation over micro-batches (OP-STR-STATEFUL: Minerva's
per-bucket trigger polling → foreachBatch) and the notification
append-only sink it feeds (OP-SNK-NOTIF)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from python_minerva_etl_spark.operators.notification import (
    append_notifications, query_notifications)
from python_minerva_etl_spark.operators.trigger import (ThresholdRule,
                                                        evaluate)
from python_minerva_etl_spark.registry import load_table
from python_minerva_etl_spark.streaming.tumble import read_events_stream

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "streaming")

RULE = ThresholdRule(
    name="high_value",
    kpi="value",
    thresholds=(("critical", 90.0), ("major", 75.0), ("warning", 50.0)),
    condition="event_type <> 'error'",
    weights={"critical": 100, "major": 50, "warning": 10},
)


def test_foreachbatch_trigger_to_notification_sink(spark):
    """Stream → trigger rules per micro-batch → append-only
    notification store; result equals batch trigger evaluation."""
    sf = "/root/testdata/sf0.001"
    shutil.rmtree(SCRATCH, ignore_errors=True)
    sink = os.path.join(SCRATCH, "notifications")

    def process(batch_df, batch_id):
        notif = evaluate(batch_df, RULE, entity_col="user_id", ts_col="ts")
        append_notifications(
            notif.select("event_id", "user_id", "ts", "severity", "weight"),
            sink)

    stream = read_events_stream(spark, sf)
    q = (stream.writeStream.foreachBatch(process)
         .option("checkpointLocation", os.path.join(SCRATCH, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(sink)
    want = evaluate(load_table(spark, sf, "events"), RULE,
                    entity_col="user_id", ts_col="ts")
    assert got.count() == want.count() > 0
    assert (got.agg(F.sum("weight")).collect()[0][0]
            == want.agg(F.sum("weight")).collect()[0][0])


def test_notification_query_time_range(spark):
    """OP-NOTIF-QUERY over the appended store: range + attribute filter
    + ordering; appends never rewrite existing files."""
    sf = "/root/testdata/sf0.001"
    shutil.rmtree(SCRATCH, ignore_errors=True)
    sink = os.path.join(SCRATCH, "notifications")
    ev = load_table(spark, sf, "events")
    notif = evaluate(ev, RULE, entity_col="user_id", ts_col="ts").select(
        "event_id", "user_id", "ts", "severity", "weight")
    append_notifications(notif, sink)
    n_files_1 = sum(len(fs) for _, _, fs in os.walk(sink))
    append_notifications(notif.limit(5), sink)  # second append
    n_files_2 = sum(len(fs) for _, _, fs in os.walk(sink))
    assert n_files_2 > n_files_1  # append-only: strictly more files

    out = query_notifications(
        spark, sink, "2024-01-05 00:00:00", "2024-01-10 00:00:00",
        predicate="severity = 'critical'").collect()
    assert len(out) > 0
    assert all(r.severity == "critical" for r in out)
    ts = [r.ts for r in out]
    assert ts == sorted(ts)
    assert all("2024-01-05" <= str(r.ts)[:10] < "2024-01-10" for r in out)


def test_session_window_matches_batch_sessionize(spark):
    """OP-STR-SESSION: Spark's native session_window (usable in
    streaming with watermark) agrees with the batch lag+cumsum
    sessionize on session count, membership and bounds."""
    from python_minerva_etl_spark.operators.sessionize import sessionize

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    native = (ev.groupBy("user_id",
                         F.session_window("ts", "30 minutes").alias("w"))
              .agg(F.count("*").alias("n_events"))
              .select("user_id", "n_events"))
    ours = (sessionize(ev, ["user_id"], "ts", 1800, ["event_id"])
            .groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", "n_events"))
    a = sorted(map(tuple, native.collect()))
    b = sorted(map(tuple, ours.collect()))
    assert a == b


def test_stream_dedup_equals_batch_distinct(spark):
    from python_minerva_etl_spark.streaming.dedup import (
        run_append_available_now, stream_dedup)

    sf = "/root/testdata/sf0.001"
    batch = load_table(spark, sf, "events") \
        .select("user_id", "event_type").distinct()
    want = {(r.user_id, r.event_type) for r in batch.collect()}
    # run twice in one session: memory-sink names must not collide
    for tag in ("a", "b"):
        stream = read_events_stream(spark, sf)
        out = run_append_available_now(
            spark, stream_dedup(stream, ["user_id", "event_type"]),
            f"t_dedup_{tag}")
        got = {(r.user_id, r.event_type) for r in out.collect()}
        assert got == want


def test_stream_dedup_within_watermark_bounds_state(spark):
    """The state-bounded variant still yields a subset-free result on
    a single static batch (every duplicate is inside one microbatch)."""
    from python_minerva_etl_spark.streaming.dedup import (
        run_append_available_now, stream_dedup)

    sf = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, sf)
    out = run_append_available_now(
        spark, stream_dedup(stream, ["user_id", "event_type"],
                            within_watermark=True),
        "t_dedup_ww")
    batch = load_table(spark, sf, "events") \
        .select("user_id", "event_type").distinct()
    assert out.count() == batch.count()


def test_stream_interval_join_equals_batch_join(spark):
    """Watermarked stream-stream interval join == the batch interval
    join over the same events (inner joins emit each match in the
    completing micro-batch; one availableNow pass sees everything)."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.streaming.join import (
        run_append_available_now, stream_interval_join)

    sf = "/root/testdata/sf0.001"
    clicks = read_events_stream(spark, sf).filter(
        F.col("event_type") == "click")
    errors = read_events_stream(spark, sf).filter(
        F.col("event_type") == "error")
    out = run_append_available_now(
        spark, stream_interval_join(clicks, errors, interval="10 minutes"),
        "t_sjoin")

    ev = load_table(spark, sf, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("left_id"),
        F.col("ts").alias("l_ts"))
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("right_id"), F.col("ts").alias("r_ts"))
    batch = c.join(e, (F.col("user_id") == F.col("r_user"))
                   & (F.col("r_ts") >= F.col("l_ts"))
                   & (F.col("r_ts") <= F.col("l_ts")
                      + F.expr("INTERVAL 10 minutes")))
    want = {(r.user_id, r.left_id, r.right_id) for r in batch.collect()}
    got = {(r.user_id, r.left_id, r.right_id) for r in out.collect()}
    assert got == want


def test_watermark_drop_matches_batch_prediction(spark, tmp_path):
    """Micro-batch watermark fidelity: replay events in arrival order
    (4 files, one per trigger) through a watermarked append-mode
    tumbling aggregation, and verify Spark's ACTUAL drop/emit
    behavior equals the batch-side prediction — a row is dropped iff
    its window end <= the watermark at its arrival batch (watermark =
    max event time of earlier batches - delay), and a window is
    emitted iff its end <= the final watermark.  This pins the
    semantics late_data_report audits."""
    import glob
    import os
    import shutil
    import time
    from collections import Counter

    import pandas as pd
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.registry import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts", "value")
    pdf = ev.toPandas().sort_values("event_id").reset_index(drop=True)
    n, K = len(pdf), 4
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    ids = list(pdf.event_id)
    for i in range(K):
        lo, hi = ids[i * n // K], ids[(i + 1) * n // K - 1]
        chunk = ev.filter((F.col("event_id") >= lo)
                          & (F.col("event_id") <= hi)).coalesce(1)
        tmp = str(tmp_path / f"chunk_{i}")
        chunk.write.parquet(tmp)
        dst = os.path.join(inbox, f"{i:02d}.parquet")
        shutil.copyfile(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (time.time() + i, time.time() + i))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1").parquet(inbox))
    agg = (stream.withWatermark("ts", "2 hours")
           .groupBy("user_id", F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n"))
           .select("user_id", F.col("w.start").alias("bucket"), "n"))
    q = (agg.writeStream.format("memory").queryName("wm_fidelity")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()
    got = {(r.user_id, r.bucket): r.n
           for r in spark.table("wm_fidelity").collect()}

    delay, hour = pd.Timedelta(hours=2), pd.Timedelta(hours=1)
    wm = None
    kept = []
    for i in range(K):
        part = pdf.iloc[i * n // K:(i + 1) * n // K]
        for r in part.itertuples():
            if wm is None or r.ts.floor("h") + hour > wm:
                kept.append((r.user_id, r.ts.floor("h")))
        cand = part.ts.max() - delay
        if wm is None or cand > wm:
            wm = cand
    counts = Counter(kept)
    pred = {k: v for k, v in counts.items() if k[1] + hour <= wm}

    assert got == pred
    assert sum(pred.values()) < n          # some rows really dropped
    assert len(pred) < len(counts)         # some windows withheld
