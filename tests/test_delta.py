"""Delta-protocol interop: log replay, time travel, overwrite
semantics, Hive-partitioned reads, checkpoint compaction, commit
atomicity — all against the public delta.io PROTOCOL.md layout, no
Delta jar involved."""

from __future__ import annotations

import json
import os

import pytest

from python_minerva_etl_spark.storage.delta import (DeltaTable, read_delta,
                                                    write_delta)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_write_read_roundtrip_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    assert write_delta(spark, df1, p) == 0
    assert write_delta(spark, df2, p) == 1
    assert _rows(read_delta(spark, p)) == [(1, "a"), (2, "b"), (3, "c")]
    # time travel to v0
    assert _rows(read_delta(spark, p, version_as_of=0)) == [(1, "a"),
                                                           (2, "b")]
    # the log on disk is real protocol JSON: v0 carries protocol+meta
    with open(os.path.join(p, "_delta_log",
                           f"{0:020d}.json")) as fh:
        kinds = [next(iter(json.loads(l))) for l in fh if l.strip()]
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds


def test_overwrite_removes_prior_files(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame(
        [(1, "a")], "id long, v string"), p)
    write_delta(spark, spark.createDataFrame(
        [(9, "z")], "id long, v string"), p, mode="overwrite")
    assert _rows(read_delta(spark, p)) == [(9, "z")]
    # prior version still reconstructable (remove is logical)
    assert _rows(read_delta(spark, p, version_as_of=0)) == [(1, "a")]
    snap = DeltaTable(p)._replay(1)
    with open(os.path.join(p, "_delta_log", f"{1:020d}.json")) as fh:
        kinds = [next(iter(json.loads(l))) for l in fh if l.strip()]
    assert "remove" in kinds
    assert len(snap["files"]) >= 1


def test_read_foreign_partitioned_table(spark, tmp_path):
    """Hand-craft the layout another engine would write: data files in
    hive-style partition dirs, partition col ABSENT from the files,
    recorded only in add.partitionValues."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "ext")
    os.makedirs(os.path.join(p, "_delta_log"))
    schema = ('{"type":"struct","fields":['
              '{"name":"id","type":"long","nullable":true,"metadata":{}},'
              '{"name":"day","type":"string","nullable":true,'
              '"metadata":{}}]}')
    for day, ids in (("2024-01-01", [1, 2]), ("2024-01-02", [3])):
        d = os.path.join(p, f"day={day}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}),
                       os.path.join(d, "part-0.parquet"))
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": schema,
                      "partitionColumns": ["day"],
                      "configuration": {}}},
        {"add": {"path": "day=2024-01-01/part-0.parquet",
                 "partitionValues": {"day": "2024-01-01"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "day=2024-01-02/part-0.parquet",
                 "partitionValues": {"day": "2024-01-02"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(p, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    got = read_delta(spark, p)
    assert got.columns == ["id", "day"]
    assert _rows(got) == [(1, "2024-01-01"), (2, "2024-01-01"),
                          (3, "2024-01-02")]


def test_checkpoint_written_and_actually_used(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(12):
        write_delta(spark, spark.createDataFrame(
            [(i,)], "id long"), p)
    log = os.path.join(p, "_delta_log")
    assert os.path.exists(os.path.join(
        log, f"{10:020d}.checkpoint.parquet"))
    last = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert last["version"] == 10
    # PROOF the reader replays from the checkpoint: delete every JSON
    # commit at or below it — reads must still succeed
    for v in range(11):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    assert _rows(read_delta(spark, p)) == [(i,) for i in range(12)]


def test_commit_conflict_and_bad_versions(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame([(1,)], "id long"), p)
    t = DeltaTable(p)
    with pytest.raises(FileExistsError, match="concurrent"):
        t._commit(0, [{"commitInfo": {}}])
    with pytest.raises(ValueError, match="not in Delta log"):
        t.read(spark, version_as_of=99)
    with pytest.raises(FileNotFoundError):
        DeltaTable(str(tmp_path / "nope")).read(spark)


def test_unsupported_reader_features_refused(spark, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(os.path.join(p, "_delta_log"))
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "x",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": '{"type":"struct","fields":[]}',
                      "partitionColumns": [], "configuration": {}}},
    ]
    with open(os.path.join(p, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    with pytest.raises(NotImplementedError, match="deletionVectors"):
        read_delta(spark, p)


def test_schema_and_empty_snapshot(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2.5)], "id long, x double")
    write_delta(spark, df, p)
    assert DeltaTable(p).schema().fieldNames() == ["id", "x"]
    # overwrite with empty frame -> empty active set, schema preserved
    write_delta(spark, df.limit(0), p, mode="overwrite")
    got = read_delta(spark, p)
    assert got.count() == 0 and got.columns == ["id", "x"]


def test_snaptable_export_and_plugin(spark, tmp_path):
    """SnapTable snapshots publish as Delta commits; the harvest
    plugin registry reads them back by file_type 'delta'."""
    from python_minerva_etl_spark.sources.plugins import get_plugin
    from python_minerva_etl_spark.storage.snaptable import SnapTable

    st = SnapTable(str(tmp_path / "snap"))
    st.merge(spark, spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 2.0)], "k long, seq long, v double"),
        ["k"], "seq")
    dst = str(tmp_path / "delta")
    assert st.export_delta(spark, dst) == 0
    st.merge(spark, spark.createDataFrame(
        [(1, 20, 9.0)], "k long, seq long, v double"), ["k"], "seq")
    assert st.export_delta(spark, dst) == 1
    got = get_plugin("delta")(spark, dst)
    assert _rows(got.select("k", "v")) == [(1, 9.0), (2, 2.0)]
    # Delta-side time travel mirrors SnapTable history
    v0 = read_delta(spark, dst, version_as_of=0)
    assert _rows(v0.select("k", "v")) == [(1, 1.0), (2, 2.0)]
