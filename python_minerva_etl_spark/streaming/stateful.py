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
