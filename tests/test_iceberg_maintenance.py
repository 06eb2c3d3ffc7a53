"""Iceberg maintenance ops: compact_iceberg (rewrite_data_files — a
REPLACE snapshot of delete-free files) and expire_snapshots
(retention by count + physical deletion of files only expired
snapshots reach)."""

from __future__ import annotations

import os

import pytest

from python_minerva_etl_spark.storage.iceberg import (IcebergTable,
                                                      read_iceberg)
from python_minerva_etl_spark.storage.iceberg_write import (
    compact_iceberg, delete_iceberg, expire_snapshots, write_iceberg)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _current_files(p):
    t = IcebergTable(p)
    md = t.metadata()
    return t._data_files(t._snapshot(md, None))


def test_compact_binpacks_appends(spark, tmp_path):
    p = str(tmp_path / "t")
    for lo in (0, 10, 20):
        write_iceberg(spark, spark.range(lo, lo + 10).toDF("id"), p)
    before, _ = _current_files(p)
    assert len(before) >= 3
    sid = compact_iceberg(spark, p)
    assert sid is not None
    after, deletes = _current_files(p)
    assert len(after) < len(before) and not deletes
    got = read_iceberg(spark, p)
    assert _rows(got) == [(i,) for i in range(30)]
    # prior snapshots survive until expiry: time travel still works
    md = IcebergTable(p).metadata()
    old = [s["snapshot-id"] for s in md["snapshots"]
           if s["snapshot-id"] != sid]
    assert old
    assert read_iceberg(spark, p, snapshot_id=old[-1]).count() == 30
    assert md["snapshots"][-1]["summary"]["operation"] == "replace"


def test_compact_absorbs_delete_files(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(0, 50).toDF("id"), p)
    delete_iceberg(spark, p, [("id", "<", 10)])
    _, deletes = _current_files(p)
    assert deletes
    assert compact_iceberg(spark, p) is not None
    data, deletes = _current_files(p)
    assert not deletes
    got = read_iceberg(spark, p)
    assert got.count() == 40
    assert got.filter("id < 10").count() == 0


def test_compact_noop_single_clean_file(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(0, 5).toDF("id").coalesce(1), p)
    assert compact_iceberg(spark, p) is None


def test_compact_partitioned_keeps_pruning(spark, tmp_path):
    p = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")],
                                "id long, k string")
    df2 = spark.createDataFrame([(3, "a"), (4, "b")],
                                "id long, k string")
    write_iceberg(spark, df1, p, partition_by="k")
    write_iceberg(spark, df2, p, partition_by="k")
    assert compact_iceberg(spark, p) is not None
    assert _rows(read_iceberg(spark, p)) == [
        (1, "a"), (2, "b"), (3, "a"), (4, "b")]
    # predicate pruning on the partition column still works
    assert _rows(read_iceberg(spark, p, where=[("k", "=", "a")])) == [
        (1, "a"), (3, "a")]


def test_expire_keeps_reachable_files(spark, tmp_path):
    """Fast appends carry prior manifests into the current snapshot,
    so expiring old snapshots must delete NOTHING the current one
    reaches."""
    p = str(tmp_path / "t")
    for lo in (0, 10, 20):
        write_iceberg(spark, spark.range(lo, lo + 10).toDF("id"), p)
    md = IcebergTable(p).metadata()
    assert len(md["snapshots"]) == 3
    old_ids = [s["snapshot-id"] for s in md["snapshots"][:-1]]
    deleted = expire_snapshots(p, keep_last=1)
    # only the expired snapshots' manifest-LIST files go (the kept
    # snapshot references their manifests and data, not their lists)
    assert all(os.path.basename(d).startswith("snap-")
               for d in deleted) and len(deleted) == 2
    md = IcebergTable(p).metadata()
    assert [s["snapshot-id"] for s in md["snapshots"]] == [3]
    assert read_iceberg(spark, p).count() == 30
    with pytest.raises(ValueError, match="not in metadata"):
        read_iceberg(spark, p, snapshot_id=old_ids[0])


def test_expire_after_compact_deletes_old_files(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(0, 20).toDF("id"), p)
    write_iceberg(spark, spark.range(20, 40).toDF("id"), p)
    delete_iceberg(spark, p, [("id", "<", 5)])
    old_data = {os.path.abspath(f["file_path"])
                for f in _current_files(p)[0]}
    old_deletes = {os.path.abspath(f["file_path"])
                   for f in _current_files(p)[1]}
    compact_iceberg(spark, p)
    deleted = set(expire_snapshots(p, keep_last=1))
    # every pre-compaction data AND delete file became unreachable
    assert old_data <= deleted
    assert old_deletes <= deleted
    for f in old_data | old_deletes:
        assert not os.path.exists(f)
    got = read_iceberg(spark, p)
    assert got.count() == 35
    assert got.filter("id < 5").count() == 0
    # the new current snapshot's files are untouched
    data, deletes = _current_files(p)
    assert data and not deletes
    for f in data:
        assert os.path.exists(f["file_path"])


def test_expire_validates_keep_last(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(0, 3).toDF("id"), p)
    with pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(p, keep_last=0)
    assert expire_snapshots(p, keep_last=1) == []  # nothing to expire
