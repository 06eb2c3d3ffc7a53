"""Partitioned Delta scan fast path: Hive-conformant layouts read as
ONE FileScan with basePath-derived partition columns (O(1) plan size
at any partition count) instead of one scan per partition-value
group; non-conformant / column-mapped / fractional-typed layouts keep
the general group-union path."""

from __future__ import annotations

import contextlib
import io
import json
import os

from pyspark.sql import functions as F

from python_minerva_etl_spark.storage.delta import (DeltaTable,
                                                    read_delta,
                                                    write_delta)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _scan_count(df) -> int:
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    # one "(N) Scan parquet" detail entry per relation
    return len(re.findall(r"^\(\d+\) Scan parquet",
                          buf.getvalue(), re.M))


def _partitioned(spark, p, n_parts=6):
    df = spark.createDataFrame(
        [(i, i % n_parts, float(i)) for i in range(4 * n_parts)],
        "id long, bucket int, value double")
    DeltaTable(p).write(spark, df, partition_by=["bucket"])
    return DeltaTable(p)


def test_fast_path_single_scan(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = _partitioned(spark, p)
    out = dt.read(spark)
    assert _scan_count(out) == 1
    assert len(_rows(out)) == 24
    assert _rows(out.filter("bucket = 3").select("id")) == [
        (i,) for i in range(24) if i % 6 == 3]


def test_fast_path_matches_general_path(spark, tmp_path,
                                        monkeypatch):
    p = str(tmp_path / "t")
    dt = _partitioned(spark, p)
    fast = _rows(dt.read(spark))
    monkeypatch.setattr(DeltaTable, "_hive_layout",
                        staticmethod(lambda *a: False))
    slow_df = DeltaTable(p).read(spark)
    assert _scan_count(slow_df) > 1  # group-union general path
    assert _rows(slow_df) == fast


def test_fast_path_partition_filter_prunes(spark, tmp_path):
    # with one relation, a partition-column predicate is real
    # partition pruning: the excluded files are never opened
    p = str(tmp_path / "t")
    dt = _partitioned(spark, p, n_parts=3)
    victims = [f["path"] for f in dt._replay()["files"]
               if f["partitionValues"]["bucket"] != "1"]
    for rel in victims:
        with open(os.path.join(p, rel), "wb") as fh:
            fh.write(b"garbage")
    got = dt.read(spark).filter(F.col("bucket") == 1).select("id")
    assert _rows(got) == [(i,) for i in range(12) if i % 3 == 1]


def test_foreign_flat_layout_falls_back(spark, tmp_path):
    # partitionValues only in the log, files NOT in Hive dirs: the
    # general path must serve it (and still be correct)
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "ext")
    os.makedirs(os.path.join(p, "_delta_log"))
    schema = ('{"type":"struct","fields":['
              '{"name":"id","type":"long","nullable":true,'
              '"metadata":{}},'
              '{"name":"day","type":"string","nullable":true,'
              '"metadata":{}}]}')
    for i, (day, ids) in enumerate(
            (("2024-01-01", [1, 2]), ("2024-01-02", [3]))):
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}),
                       os.path.join(p, f"flat-{i}.parquet"))
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x",
                      "format": {"provider": "parquet",
                                 "options": {}},
                      "schemaString": schema,
                      "partitionColumns": ["day"],
                      "configuration": {}}},
        {"add": {"path": "flat-0.parquet",
                 "partitionValues": {"day": "2024-01-01"},
                 "size": 1, "modificationTime": 0,
                 "dataChange": True}},
        {"add": {"path": "flat-1.parquet",
                 "partitionValues": {"day": "2024-01-02"},
                 "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ]
    with open(os.path.join(p, "_delta_log",
                           f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    df = read_delta(spark, p)
    assert _scan_count(df) == 2
    assert _rows(df) == [(1, "2024-01-01"), (2, "2024-01-01"),
                         (3, "2024-01-02")]


def test_null_partition_value_on_fast_path(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")],
        "id long, grp string")
    DeltaTable(p).write(spark, df, partition_by=["grp"])
    out = DeltaTable(p).read(spark)
    assert _scan_count(out) == 1
    assert _rows(out) == [(1, "a"), (2, None), (3, "a")]


def test_fast_path_composes_with_dvs(spark, tmp_path):
    # need_pos scan (DV application) rides the same single relation
    p = str(tmp_path / "t")
    dt = _partitioned(spark, p, n_parts=4)
    dt.delete(spark, "id % 2 = 0")
    out = dt.read(spark)
    assert _scan_count(out) == 1
    assert _rows(out.select("id")) == [(i,) for i in range(16)
                                       if i % 2 == 1]


def test_timestamp_partition_stays_on_general_path(spark, tmp_path):
    # timestamp dir formatting is session-zone dependent: the fast
    # path refuses it by type, the literal path stays exact
    p = str(tmp_path / "t")
    df = spark.sql(
        "SELECT id, timestamp'2024-01-01 10:00:00' + "
        "make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts, "
        "CAST(id AS DOUBLE) AS v FROM range(4)")
    DeltaTable(p).write(spark, df, partition_by=["ts"])
    out = DeltaTable(p).read(spark)
    assert _scan_count(out) >= 4
    assert len(_rows(out)) == 4
