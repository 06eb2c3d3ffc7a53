"""Streaming ingest deduplication (OP-STR-* × EXT-DEDUP): the
exactly-once guard a harvest inbox needs when sources redeliver files
or rows.

``dropDuplicates`` over the natural key keeps the first-seen row per
key with streaming state; an ``availableNow`` run over a static inbox
therefore equals batch ``SELECT DISTINCT`` on the key columns — the
driver-checkable parity form.

State note for 100 TB streams: plain ``dropDuplicates`` state never
expires unless the event-time column is part of the key subset.  For
unbounded streams either include the watermarked event-time column in
``key_cols`` (state purges as the watermark passes) or use
``within_watermark=True`` (Spark's ``dropDuplicatesWithinWatermark``),
which bounds state but re-admits duplicates separated by more than the
watermark — at that point batch-DISTINCT parity becomes approximate,
which is why the declared parity query uses the exact form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup(events: DataFrame, key_cols: Sequence[str],
                 watermark: str = "30 minutes",
                 ts_col: str = "ts",
                 within_watermark: bool = False) -> DataFrame:
    """First-seen-per-key dedup over a watermarked stream; emits the
    key columns (append mode emits each key exactly once)."""
    marked = events.withWatermark(ts_col, watermark)
    if within_watermark:
        deduped = marked.dropDuplicatesWithinWatermark(list(key_cols))
    else:
        deduped = marked.dropDuplicates(list(key_cols))
    return deduped.select(*key_cols)


def run_append_available_now(spark, result: DataFrame,
                             query_name: str) -> DataFrame:
    """availableNow append-mode run into a memory sink (dedup emits
    rows immediately; no window to hold back, unlike the tumbling
    aggregates which need ``complete``)."""
    q = (result.writeStream.format("memory")
         .queryName(query_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    q.stop()
    return spark.table(query_name)
