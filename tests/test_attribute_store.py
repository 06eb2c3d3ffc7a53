"""Attribute-store write path: append-only-on-change history
(ref: attributestore.store round-trip — the reference's integration
test shape: store → query back → assert)."""

from __future__ import annotations

import os
import shutil

from python_minerva_etl_spark.operators.attribute import (curr_view,
                                                          store_attributes)

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "attr_store")


def _batch(spark, rows):
    from datetime import datetime

    typed = [(e, datetime.fromisoformat(ts), s, p) for e, ts, s, p in rows]
    return spark.createDataFrame(
        typed, "entity bigint, ts timestamp, status string, plan string")


def test_store_appends_only_changes(spark):
    shutil.rmtree(SCRATCH, ignore_errors=True)
    path = os.path.join(SCRATCH, "attrs")
    cols = dict(key=["entity"], ts_col="ts", attr_cols=["status", "plan"])

    n1 = store_attributes(spark, _batch(spark, [
        (1, "2024-01-01 00:00:00", "active", "gold"),
        (2, "2024-01-01 00:00:00", "active", "basic"),
    ]), path, **cols)
    assert n1 == 2

    # identical re-load: a no-op (the reference's idempotent store)
    n2 = store_attributes(spark, _batch(spark, [
        (1, "2024-01-02 00:00:00", "active", "gold"),
        (2, "2024-01-02 00:00:00", "active", "basic"),
    ]), path, **cols)
    assert n2 == 0

    # one entity changes; the other stays — only the change appends
    n3 = store_attributes(spark, _batch(spark, [
        (1, "2024-01-03 00:00:00", "suspended", "gold"),
        (2, "2024-01-03 00:00:00", "active", "basic"),
    ]), path, **cols)
    assert n3 == 1

    hist = spark.read.parquet(path)
    assert hist.count() == 3  # 2 initial + 1 change
    curr = {r.entity: (r.status, r.plan)
            for r in curr_view(hist, ["entity"], ["ts"]).collect()}
    assert curr == {1: ("suspended", "gold"), 2: ("active", "basic")}


def test_store_collapses_within_batch_transitions(spark):
    shutil.rmtree(SCRATCH, ignore_errors=True)
    path = os.path.join(SCRATCH, "attrs2")
    n = store_attributes(spark, _batch(spark, [
        (7, "2024-01-01 00:00:00", "a", "x"),
        (7, "2024-01-01 01:00:00", "a", "x"),   # no change -> dropped
        (7, "2024-01-01 02:00:00", "b", "x"),   # transition kept
        (7, "2024-01-01 03:00:00", "b", "x"),   # no change -> dropped
    ]), path, key=["entity"], ts_col="ts", attr_cols=["status", "plan"])
    assert n == 2


def test_store_new_entity_into_existing_store(spark):
    """A previously-unseen entity must append (regression: NULL
    three-valued logic in the curr-hash filter dropped it)."""
    shutil.rmtree(SCRATCH, ignore_errors=True)
    path = os.path.join(SCRATCH, "attrs3")
    cols = dict(key=["entity"], ts_col="ts", attr_cols=["status", "plan"])
    store_attributes(spark, _batch(spark, [
        (1, "2024-01-01 00:00:00", "active", "gold")]), path, **cols)
    n = store_attributes(spark, _batch(spark, [
        (2, "2024-01-02 00:00:00", "active", "basic")]), path, **cols)
    assert n == 1
    curr = {r.entity for r in spark.read.parquet(path).collect()}
    assert curr == {1, 2}


def test_store_replay_of_multi_transition_batch_is_noop(spark):
    """Re-loading an already-stored multi-transition batch appends
    nothing (regression: only the first row was curr-checked)."""
    shutil.rmtree(SCRATCH, ignore_errors=True)
    path = os.path.join(SCRATCH, "attrs4")
    cols = dict(key=["entity"], ts_col="ts", attr_cols=["status", "plan"])
    batch = _batch(spark, [
        (1, "2024-01-01 00:00:00", "a", "x"),
        (1, "2024-01-02 00:00:00", "b", "x"),
    ])
    n1 = store_attributes(spark, batch, path, **cols)
    n2 = store_attributes(spark, batch, path, **cols)
    assert n1 == 2 and n2 == 0
    assert spark.read.parquet(path).count() == 2
