"""Iceberg snapshot references (tags/branches): create, resolve on
read, drop, and protection from snapshot expiry."""

from __future__ import annotations

import pytest

from python_minerva_etl_spark.storage.iceberg import (IcebergTable,
                                                      read_iceberg)
from python_minerva_etl_spark.storage.iceberg_write import (
    drop_ref_iceberg, expire_snapshots, tag_iceberg, write_iceberg)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tag_pins_a_snapshot_for_reads(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(3).toDF("id"), p)
    sid = tag_iceberg(p, "v1.0")
    write_iceberg(spark, spark.range(3, 6).toDF("id"), p)
    assert _rows(read_iceberg(spark, p, ref="v1.0")) == [
        (0,), (1,), (2,)]
    assert len(_rows(read_iceberg(spark, p))) == 6
    assert IcebergTable(p).resolve_ref("v1.0") == sid


def test_tag_explicit_snapshot_and_branch_type(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(2).toDF("id"), p)
    s1 = IcebergTable(p).metadata()["current-snapshot-id"]
    write_iceberg(spark, spark.range(2, 4).toDF("id"), p)
    tag_iceberg(p, "audit", snapshot_id=s1, ref_type="branch")
    md = IcebergTable(p).metadata()
    assert md["refs"]["audit"] == {"snapshot-id": s1,
                                   "type": "branch"}
    assert _rows(read_iceberg(spark, p, ref="audit")) == [(0,), (1,)]


def test_unknown_ref_and_conflicting_args_refuse(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(1).toDF("id"), p)
    with pytest.raises(ValueError, match="no ref"):
        read_iceberg(spark, p, ref="nope")
    sid = IcebergTable(p).metadata()["current-snapshot-id"]
    tag_iceberg(p, "t1")
    with pytest.raises(ValueError, match="only one of"):
        read_iceberg(spark, p, snapshot_id=sid, ref="t1")
    with pytest.raises(ValueError, match="not in metadata"):
        tag_iceberg(p, "bad", snapshot_id=12345)


def test_drop_ref(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(1).toDF("id"), p)
    tag_iceberg(p, "gone")
    drop_ref_iceberg(p, "gone")
    with pytest.raises(ValueError, match="no ref"):
        read_iceberg(spark, p, ref="gone")
    with pytest.raises(ValueError, match="no ref"):
        drop_ref_iceberg(p, "gone")


def test_expire_protects_tagged_snapshots(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(2).toDF("id"), p)
    tag_iceberg(p, "keepme")
    write_iceberg(spark, spark.range(2, 4).toDF("id"), p)
    write_iceberg(spark, spark.range(4, 6).toDF("id"), p)
    deleted = expire_snapshots(p, keep_last=1)
    md = IcebergTable(p).metadata()
    ids = {s["snapshot-id"] for s in md["snapshots"]}
    # the tagged snapshot survived expiry; the middle one is gone
    assert md["refs"]["keepme"]["snapshot-id"] in ids
    assert len(ids) == 2
    # and its data still reads through the ref
    assert _rows(read_iceberg(spark, p, ref="keepme")) == [
        (0,), (1,)]
    assert deleted  # something actually expired
