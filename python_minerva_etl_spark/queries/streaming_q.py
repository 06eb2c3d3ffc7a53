"""Declared queries: streaming twins + incremental materialization
(SURVEY.md §2.8, §2.9).

Both are declared WITH oracles: stream-batch parity (availableNow ≡
batch) and incremental-equals-full are exact by construction, so the
batch SQL is a valid oracle for the streaming/incremental result.
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import functions as F

from ..determinism import oracle_dsum
from ..operators.materialization import (materialize_incremental,
                                         read_target)
from ..streaming.tumble import (read_events_stream, run_available_now,
                                tumbling_agg)
from .base import DeclaredQuery, t
from .trend import _TRIGGER_THRESHOLD_SQL as _STREAM_TRIGGER_PARITY_SQL
from .trend import _scratch_tag

_STREAM_SEQ = itertools.count()

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def _stream_tumble_parity(spark, sf_dir):
    """OP-STR-TUMBLE/OP-STR-WATERMARK: the streaming flagship — file
    stream → watermarked tumbling 1h window → decimal-exact aggregates,
    executed availableNow into a memory sink.  Equals the batch twin
    bit-for-bit (the oracle is plain batch SQL)."""
    stream = read_events_stream(spark, sf_dir)
    result = tumbling_agg(stream, width="1 hour", watermark="30 minutes")
    name = f"stream_tumble_{next(_STREAM_SEQ)}"
    return run_available_now(spark, result, name)


_STREAM_TUMBLE_PARITY_SQL = f"""
SELECT user_id,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


def _stream_sliding_parity(spark, sf_dir):
    """OP-STR-TUMBLE (hopping variant): watermarked 1h windows sliding
    every 15m in Structured Streaming, availableNow — equals the batch
    hopping query bit-for-bit (same oracle family as
    agg_time_sliding, keyed by event_type)."""
    stream = read_events_stream(spark, sf_dir)
    result = tumbling_agg(stream, width="1 hour",
                          watermark="30 minutes", slide="15 minutes",
                          key_col="event_type")
    name = f"stream_sliding_{next(_STREAM_SEQ)}"
    return run_available_now(spark, result, name)


_STREAM_SLIDING_PARITY_SQL = f"""
WITH k AS (SELECT unnest(generate_series(0, 3)) AS k),
w AS (
  SELECT TIMESTAMP '1970-01-01 00:00:00'
           + to_seconds(CAST(floor(epoch(ts) / 900) * 900 - k * 900
                             AS BIGINT)) AS bucket,
         event_type, value
  FROM events CROSS JOIN k
)
SELECT event_type, bucket,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value
FROM w
GROUP BY 1, 2
"""


def _stream_enrich_parity(spark, sf_dir):
    """OP-STR-INGEST (stream-static enrichment): the event stream
    joined to the static customer dimension (broadcast — each
    micro-batch enriches scan-local, no stream-side shuffle and no
    streaming state at all).  availableNow append == the batch join
    bit-for-bit; at 100 TB the dim is re-broadcast per batch, so dim
    updates between batches are picked up without restarting."""
    stream = read_events_stream(spark, sf_dir)
    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"))
    enriched = (stream.join(F.broadcast(dim), "user_id")
                .select("event_id", "user_id", "segment", "value"))
    name = f"stream_enrich_{next(_STREAM_SEQ)}"
    return run_available_now(spark, enriched, name, output_mode="append")


_STREAM_ENRICH_PARITY_SQL = """
SELECT e.event_id, e.user_id, c.c_mktsegment AS segment, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


def _stream_dedup_parity(spark, sf_dir):
    """OP-STR × EXT-DEDUP: watermarked first-seen-per-key streaming
    dedup on the (user_id, event_type) natural key, availableNow —
    equals batch SELECT DISTINCT exactly (append mode emits each key
    once)."""
    from ..streaming.dedup import run_append_available_now, stream_dedup

    stream = read_events_stream(spark, sf_dir)
    result = stream_dedup(stream, ["user_id", "event_type"])
    name = f"stream_dedup_{next(_STREAM_SEQ)}"
    return run_append_available_now(spark, result, name)


_STREAM_DEDUP_PARITY_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""

# The batch session_window oracle (trend.py's events_session_window):
# a new session starts when the gap is >= 30 minutes.
_STREAM_SESSION_PARITY_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM gaps
)
SELECT user_id,
       CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
FROM runs GROUP BY user_id, session_seq
"""


def _stream_session_parity(spark, sf_dir):
    """OP-STR-SESSION (streaming, native session_window): watermarked
    gap-merged sessions per user, availableNow into a memory sink —
    equals the batch session_window query bit-for-bit (complete output
    mode emits every session regardless of watermark progress).  The
    oracle is the batch gap>=30min run-id SQL."""
    from ..streaming.session import stream_sessionize

    stream = read_events_stream(spark, sf_dir)
    result = stream_sessionize(stream, gap="30 minutes",
                               watermark="30 minutes")
    name = f"stream_session_{next(_STREAM_SEQ)}"
    return run_available_now(spark, result, name)


def _stream_join_parity(spark, sf_dir):
    """OP-STR (stream-stream interval join): every error within 10
    minutes after a click by the same user, both sides watermarked
    streams, availableNow append — equals the batch interval-join SQL
    exactly (inner joins emit each match in the completing batch)."""
    from ..streaming.join import run_append_available_now, stream_interval_join

    clicks = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click")
    errors = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "error")
    result = stream_interval_join(clicks, errors, key="user_id",
                                  interval="10 minutes",
                                  watermark="30 minutes")
    name = f"stream_join_{next(_STREAM_SEQ)}"
    return run_append_available_now(spark, result, name)


_STREAM_JOIN_PARITY_SQL = """
SELECT c.user_id,
       c.event_id AS left_id,
       e.event_id AS right_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM events c JOIN events e
  ON c.user_id = e.user_id
 AND c.event_type = 'click' AND e.event_type = 'error'
 AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
"""


def _stream_trigger_parity(spark, sf_dir):
    """OP-TRIG x OP-STR: the threshold trigger evaluated ON THE STREAM
    — severity CASE + condition filter are stateless row ops, so the
    alert feed needs no watermark or state at all; availableNow append
    equals the batch trigger bit-for-bit (same oracle).  This is the
    deploy shape: alerts fire in the micro-batch the breach arrives
    in, not at the next batch run."""
    from ..operators.trigger import evaluate
    from .trend import _RULE

    stream = read_events_stream(spark, sf_dir)
    notif = evaluate(stream, _RULE, entity_col="user_id", ts_col="ts")
    out = notif.select(
        F.col("event_id"),
        F.col("user_id").alias("entity_id"),
        F.date_trunc("second", "ts").alias("ts_s"),
        "severity", "weight", "value", "trigger_name")
    name = f"stream_trigger_{next(_STREAM_SEQ)}"
    return run_available_now(spark, out, name, output_mode="append")



def _stream_anomaly_feed(spark, sf_dir):
    """OP-STR-STATEFUL (applyInPandasWithState): the running-Welford
    anomaly feed — each event judged against its user's state BEFORE
    it, three numbers of engine state per key.  Deterministic replay
    (in-batch (ts, event_id) ordering) but the Welford float path
    differs from decimal prefix sums in the last ulp → rows-only;
    flag-set agreement with the oracle-backed batch twin
    (anomaly_prefix_zscore) is locked in tests/test_streaming_stateful.py."""
    from ..streaming.stateful import streaming_anomalies

    stream = read_events_stream(spark, sf_dir)
    result = streaming_anomalies(stream, z_threshold=3.0,
                                 min_samples=10)
    name = f"stream_anomaly_{next(_STREAM_SEQ)}"
    return run_available_now(spark, result, name, output_mode="append")



def _materialize_incremental(spark, sf_dir):
    """OP-MAT-INC: fingerprint-driven incremental materialization.
    Runs the state machine twice over a two-phase load (early data,
    then the full table — simulating late arrivals): run 1 builds
    partial state, run 2 recomputes only buckets whose fingerprints
    changed.  The read-back target must equal a full one-shot
    recompute — which is exactly the oracle SQL."""
    ev = t(spark, sf_dir, "events")
    tag = _scratch_tag(sf_dir)
    base = os.path.join(_SCRATCH, f"mat_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    target = os.path.join(base, "target")
    state = os.path.join(base, "state")

    def compute(src):
        return (
            src.groupBy("user_id", "__bucket")
            .agg(F.count("*").alias("samples"),
                 F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                 .alias("sum_value"))
            .withColumnRenamed("__bucket", "day").withColumn(
                "__bucket", F.col("day"))
        )

    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    early = ev.filter(F.col("ts") < cutoff)
    materialize_incremental(spark, early, "ts", "1d", compute, target, state)
    materialize_incremental(spark, ev, "ts", "1d", compute, target, state)
    return read_target(spark, target).select(
        "user_id", "day", "samples", "sum_value")


_MATERIALIZE_INCREMENTAL_SQL = f"""
SELECT user_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


QUERIES = [
    DeclaredQuery("stream_tumble_parity", _stream_tumble_parity,
                  _STREAM_TUMBLE_PARITY_SQL, "OP-STR-TUMBLE/OP-STR-WATERMARK"),
    DeclaredQuery("materialize_incremental", _materialize_incremental,
                  _MATERIALIZE_INCREMENTAL_SQL, "OP-MAT-INC"),
    DeclaredQuery("stream_sliding_parity", _stream_sliding_parity,
                  _STREAM_SLIDING_PARITY_SQL, "OP-STR-TUMBLE (hopping)"),
    DeclaredQuery("stream_dedup_parity", _stream_dedup_parity,
                  _STREAM_DEDUP_PARITY_SQL, "OP-STR × EXT-DEDUP (ingest dedup)"),
    DeclaredQuery("stream_session_parity", _stream_session_parity,
                  _STREAM_SESSION_PARITY_SQL, "OP-STR-SESSION (streaming)"),
    DeclaredQuery("stream_join_parity", _stream_join_parity,
                  _STREAM_JOIN_PARITY_SQL,
                  "OP-STR (stream-stream interval join)"),
    DeclaredQuery("stream_enrich_parity", _stream_enrich_parity,
                  _STREAM_ENRICH_PARITY_SQL,
                  "OP-STR-INGEST (stream-static enrichment)"),
    DeclaredQuery("stream_trigger_parity", _stream_trigger_parity,
                  _STREAM_TRIGGER_PARITY_SQL,
                  "OP-TRIG x OP-STR (streaming alert feed)"),
    DeclaredQuery("stream_anomaly_feed", _stream_anomaly_feed, None,
                  "OP-STR-STATEFUL (running-Welford anomaly feed)"),
]


def _late_data_report(spark, sf_dir):
    """OP-STR-LATE, batch-checkable: replay the stream in arrival
    order (event_id is the ingest sequence) and flag every row a
    10-minute watermark would have dropped — event time older than
    the high-water mark (max event time seen so far) minus the delay.
    The high-water mark is a GLOBAL prefix max over arrival order,
    computed with the two-phase range-bucketed scan
    (operators/ranking.py::global_prefix_max) — never a
    single-partition window over the facts.  This is the audit a
    pipeline runs to size its watermark: the late fraction at delay d
    IS the data loss a streaming deployment with that watermark
    accepts."""
    from ..operators.ranking import global_prefix_max

    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"))
    hwm = global_prefix_max(ev, "event_id", "ts_us", "hwm_us")
    late = F.col("hwm_us") - F.lit(600_000_000) > F.col("ts_us")
    return (hwm.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.when(late, 1).otherwise(0)).cast("bigint")
                 .alias("n_late"),
                 F.max(F.when(late, F.col("hwm_us") - F.col("ts_us")))
                 .alias("max_lateness_us")))


_LATE_DATA_REPORT_SQL = """
WITH h AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         MAX(epoch_us(CAST(ts AS TIMESTAMP)))
           OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hwm_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN hwm_us - 600000000 > ts_us
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       MAX(CASE WHEN hwm_us - 600000000 > ts_us
                THEN hwm_us - ts_us END) AS max_lateness_us
FROM h GROUP BY 1
"""


QUERIES.append(
    DeclaredQuery("late_data_report", _late_data_report,
                  _LATE_DATA_REPORT_SQL,
                  "OP-STR-LATE/OP-STR-WATERMARK (watermark-loss audit)"))
