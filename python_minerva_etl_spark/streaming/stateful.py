"""Custom stateful streaming — running per-entity counters.

The reference's trigger/materialization loop keeps per-(entity,
bucket) state across polling iterations (materialization_state table
[U]).  Structured Streaming's built-in windowed aggs cover the bucket
case; this module is the escape hatch for state machines the built-ins
can't express (running totals that never expire, device session state,
counter-reset detection): ``applyInPandasWithState`` — per-key state
held by the streaming engine, user logic over Arrow batches.

Used sparingly by design: everything expressible as window aggs stays
JVM-side (SURVEY.md §2.10); this is for the genuinely custom remainder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s", T.DoubleType()),
])


def _update_running(key, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                       "sum_value": [s]})


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) across all micro-batches — state
    the tumbling-window operators cannot carry (it never expires)."""
    return (events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


ANOMALY_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("z", T.DoubleType()),
])

# Welford running-moment state: (n, mean, M2) — numerically stable
# online variance, O(1) per event, no raw history retained.
_WELFORD_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("m2", T.DoubleType()),
])


def _make_anomaly_fn(z_threshold: float, min_samples: int):
    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        out_ids, out_vals, out_z = [], [], []
        # Materialize every Arrow chunk before sorting: Spark splits a
        # key's micro-batch into multiple chunks (arrow
        # maxRecordsPerBatch) in arbitrary order — sorting per-chunk
        # would make the no-lookahead baseline nondeterministic for
        # keys with more rows than one chunk.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                v = float(v)
                # score against the baseline BEFORE this event — an
                # outlier must not dilute the baseline it is judged by
                # until after judgment
                if n >= min_samples:
                    std = (m2 / (n - 1)) ** 0.5
                    if std > 0.0:
                        z = (v - mean) / std
                        if abs(z) > z_threshold:
                            out_ids.append(int(eid))
                            out_vals.append(v)
                            out_z.append(z)
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame({"user_id": [key[0]] * len(out_ids),
                            "event_id": out_ids, "value": out_vals,
                            "z": out_z})
    return update


def streaming_anomalies(events: DataFrame, z_threshold: float = 3.0,
                        min_samples: int = 10) -> DataFrame:
    """Streaming twin of ``operators.trigger.zscore_outliers``: flag
    events more than ``z_threshold`` stddevs from their entity's
    *running* baseline (Welford mean/M2 held as per-key engine state).

    Where the batch trigger judges against the full-history baseline,
    the stream judges each event against everything seen *before* it —
    the real-time alarm semantic (no lookahead).  State is three
    numbers per entity regardless of stream length; events inside a
    micro-batch are processed in (ts, event_id) order so replaying the
    same batches reproduces the identical flags (asserted in tests).
    """
    return (events.groupBy("user_id").applyInPandasWithState(
        _make_anomaly_fn(z_threshold, min_samples),
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_WELFORD_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))
