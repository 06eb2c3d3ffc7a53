"""Delta Change Data Feed read: explicit cdc actions win; otherwise
inserts/deletes derive from dataChange file actions — including
deletion-vector commits, where the delta is exactly the newly-masked
positions.  Compaction (dataChange=false) contributes nothing."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from python_minerva_etl_spark.storage.delta import (DeltaTable,
                                                    delete_delta,
                                                    table_changes_delta,
                                                    write_delta)


def _changes(spark, p, *a):
    return sorted(
        tuple(r) for r in table_changes_delta(spark, p, *a)
        .drop("_commit_timestamp").collect())


def test_inserts_per_commit(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame([(1,), (2,)], "id long"),
                p)
    write_delta(spark, spark.createDataFrame([(3,)], "id long"), p)
    assert _changes(spark, p) == [
        (1, "insert", 0), (2, "insert", 0), (3, "insert", 1)]
    # version slicing
    assert _changes(spark, p, 1) == [(3, "insert", 1)]
    assert _changes(spark, p, 0, 0) == [(1, "insert", 0),
                                        (2, "insert", 0)]


def test_dv_delete_yields_exact_newly_masked_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 10).toDF("id"), p)
    delete_delta(spark, p, "id < 3")      # v1: masks 0,1,2
    delete_delta(spark, p, "id in (1, 5)")  # v2: newly masks ONLY 5
    got = _changes(spark, p, 1)
    assert got == [(0, "delete", 1), (1, "delete", 1),
                   (2, "delete", 1), (5, "delete", 2)]


def test_overwrite_derives_deletes_plus_inserts(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame([(1,), (2,)], "id long"),
                p)
    write_delta(spark, spark.createDataFrame([(9,)], "id long"), p,
                mode="overwrite")
    assert _changes(spark, p, 1) == [
        (1, "delete", 1), (2, "delete", 1), (9, "insert", 1)]


def test_overwrite_after_dv_delete_emits_only_live_rows(spark,
                                                        tmp_path):
    """The overwrite's remove carries the old DV: already-deleted
    rows must NOT appear as deletes again."""
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 6).toDF("id"), p)
    delete_delta(spark, p, "id < 2")
    write_delta(spark, spark.createDataFrame([(100,)], "id long"), p,
                mode="overwrite")
    got = _changes(spark, p, 2)
    assert got == [(2, "delete", 2), (3, "delete", 2),
                   (4, "delete", 2), (5, "delete", 2),
                   (100, "insert", 2)]


def test_optimize_contributes_nothing(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 5).toDF("id"), p)
    write_delta(spark, spark.range(5, 10).toDF("id"), p)
    v = DeltaTable(p).optimize(spark)
    assert v == 2
    assert _changes(spark, p, 2, 2) == []
    # and the feed across all versions contains only the inserts
    assert len(_changes(spark, p)) == 10


def test_cdc_actions_win_over_file_actions(spark, tmp_path):
    """A commit carrying cdc actions must be read from the cdc files
    ONLY — the update pre/post images exist nowhere else."""
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), p)
    # foreign UPDATE commit: new data file + remove + cdc file
    os.makedirs(os.path.join(p, "_change_data"))
    pq.write_table(pa.table({
        "id": pa.array([1, 1], pa.int64()),
        "v": pa.array(["a", "A"]),
        "_change_type": pa.array(["update_preimage",
                                  "update_postimage"])}),
        os.path.join(p, "_change_data", "cdc-0.parquet"))
    pq.write_table(pa.table({"id": pa.array([1], pa.int64()),
                             "v": pa.array(["A"])}),
                   os.path.join(p, "f-new.parquet"))
    old = DeltaTable(p)._replay()["files"][0]["path"]
    actions = [
        {"commitInfo": {"timestamp": 1234}},
        {"cdc": {"path": "_change_data/cdc-0.parquet",
                 "partitionValues": {}, "size": 1,
                 "dataChange": False}},
        {"add": {"path": "f-new.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0,
                 "dataChange": True}},
        {"remove": {"path": old, "deletionTimestamp": 1234,
                    "dataChange": True}},
    ]
    with open(os.path.join(p, "_delta_log", f"{1:020d}.json"),
              "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    got = _changes(spark, p, 1)
    assert got == [(1, "A", "update_postimage", 1),
                   (1, "a", "update_preimage", 1)]
    # the post-commit snapshot itself reads the new file
    assert [tuple(r) for r in
            DeltaTable(p).read(spark).collect()] == [(1, "A")]


def test_partitioned_deletes_recover_partition_values(spark,
                                                      tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")],
                               "id long, part string")
    DeltaTable(p).write(spark, df, partition_by=["part"])
    write_delta(spark, spark.createDataFrame(
        [(9, "a")], "id long, part string"), p, mode="overwrite")
    got = _changes(spark, p, 1)
    assert got == [(1, "a", "delete", 1), (2, "b", "delete", 1),
                   (9, "a", "insert", 1)]


def test_missing_commits_and_underivable_rewrites_refuse(spark,
                                                         tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame([(1,)], "id long"), p)
    with pytest.raises(ValueError, match="missing"):
        table_changes_delta(spark, p, 0, 5)
    # in-place rewrite (same path removed+added, no DV, no cdc)
    f = DeltaTable(p)._replay()["files"][0]["path"]
    actions = [
        {"remove": {"path": f, "deletionTimestamp": 1,
                    "dataChange": True}},
        {"add": {"path": f, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ]
    with open(os.path.join(p, "_delta_log", f"{1:020d}.json"),
              "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    with pytest.raises(NotImplementedError, match="not derivable"):
        table_changes_delta(spark, p, 1)
