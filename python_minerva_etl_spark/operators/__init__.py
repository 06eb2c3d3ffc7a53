"""Operator library: the reusable Spark implementations behind the
declared queries (SURVEY.md §2) — attribute history windows, as-of
joins, threshold triggers, sessionization, keyed upsert, incremental
materialization."""
