"""Structured Streaming twins of the batch operators (SURVEY.md §2.8).

Minerva emulates streaming with polling harvesters + delayed
incremental materialization; Spark's native streaming is strictly more
capable.  The mapping:

- harvest polling            → file-source ``readStream``
- per-bucket materialization → tumbling ``window()`` aggregation
- stability/processing delay → ``withWatermark``
- reprocessing_period        → batch backfill (operators/materialization.py)
- trigger evaluation         → ``foreachBatch`` over the trigger rules
"""
