"""Iceberg incremental APPEND scan (IncrementalAppendScan / Spark's
start-snapshot-id read option): records added by the snapshots after
``from`` up to ``to``, walking the parent chain; delete snapshots
skip, replace/overwrite snapshots refuse, non-ancestors refuse."""

from __future__ import annotations

import pytest

from python_minerva_etl_spark.storage.iceberg import (
    IcebergTable, read_iceberg_incremental)
from python_minerva_etl_spark.storage.iceberg_write import (
    compact_iceberg, delete_iceberg, write_iceberg)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _snap_ids(p):
    return [s["snapshot-id"]
            for s in IcebergTable(p).metadata()["snapshots"]]


def _three_appends(spark, p):
    for lo in (0, 10, 20):
        write_iceberg(
            spark, spark.range(lo, lo + 5).toDF("id"), p)
    return _snap_ids(p)


def test_incremental_after_snapshot(spark, tmp_path):
    p = str(tmp_path / "t")
    s1, s2, s3 = _three_appends(spark, p)
    got = _rows(read_iceberg_incremental(spark, p, s1))
    assert got == [(i,) for i in list(range(10, 15))
                   + list(range(20, 25))]
    assert _rows(read_iceberg_incremental(spark, p, s2)) == [
        (i,) for i in range(20, 25)]
    assert _rows(read_iceberg_incremental(spark, p, s3)) == []


def test_incremental_full_history_and_to_pin(spark, tmp_path):
    p = str(tmp_path / "t")
    s1, s2, s3 = _three_appends(spark, p)
    assert len(_rows(read_iceberg_incremental(spark, p, None))) == 15
    got = _rows(read_iceberg_incremental(
        spark, p, s1, to_snapshot_id=s2))
    assert got == [(i,) for i in range(10, 15)]


def test_incremental_records_parent_chain(spark, tmp_path):
    p = str(tmp_path / "t")
    s1, s2, s3 = _three_appends(spark, p)
    snaps = IcebergTable(p).metadata()["snapshots"]
    parents = [s.get("parent-snapshot-id") for s in snaps]
    assert parents == [None, s1, s2]


def test_incremental_skips_delete_snapshots(spark, tmp_path):
    # the upstream contract: an incremental APPEND scan reports
    # appends; a delete snapshot inside the range adds nothing and
    # retracts nothing from the feed
    p = str(tmp_path / "t")
    s1, s2, s3 = _three_appends(spark, p)
    delete_iceberg(spark, p, [("id", "=", 12)])
    got = _rows(read_iceberg_incremental(spark, p, s1))
    assert got == [(i,) for i in list(range(10, 15))
                   + list(range(20, 25))]


def test_incremental_refuses_replace_in_range(spark, tmp_path):
    p = str(tmp_path / "t")
    s1, _, _ = _three_appends(spark, p)
    delete_iceberg(spark, p, [("id", "=", 3)])
    compact_iceberg(spark, p)
    with pytest.raises(ValueError, match="'replace'"):
        read_iceberg_incremental(spark, p, s1)
    # a range ending BEFORE the replace still works
    ids = _snap_ids(p)
    got = _rows(read_iceberg_incremental(
        spark, p, s1, to_snapshot_id=ids[2]))
    assert got == [(i,) for i in list(range(10, 15))
                   + list(range(20, 25))]


def test_incremental_refuses_non_ancestor(spark, tmp_path):
    p = str(tmp_path / "t")
    _three_appends(spark, p)
    with pytest.raises(ValueError, match="not an ancestor"):
        read_iceberg_incremental(spark, p, 999999)


def test_incremental_where_filters(spark, tmp_path):
    p = str(tmp_path / "t")
    s1, _, _ = _three_appends(spark, p)
    got = _rows(read_iceberg_incremental(
        spark, p, s1, where=[("id", ">=", 21)]))
    assert got == [(i,) for i in range(21, 25)]


def test_incremental_no_double_count_with_carried_manifests(
        spark, tmp_path):
    # fast-append carries prior manifests forward in every new
    # manifest list; only manifests the snapshot itself added (and
    # only ADDED entries) may contribute
    p = str(tmp_path / "t")
    s1, s2, s3 = _three_appends(spark, p)
    got = _rows(read_iceberg_incremental(spark, p, s2,
                                         to_snapshot_id=s3))
    assert got == [(i,) for i in range(20, 25)]


def test_incremental_empty_table(spark, tmp_path):
    p = str(tmp_path / "t")
    write_iceberg(spark, spark.range(0).toDF("id"), p)
    t = IcebergTable(p)
    md = t.metadata()
    if md.get("current-snapshot-id") in (None, -1):
        assert _rows(t.incremental(spark, None)) == []
    else:
        sid = md["current-snapshot-id"]
        assert _rows(t.incremental(spark, sid)) == []
