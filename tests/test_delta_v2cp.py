"""Delta V2 checkpoints (table feature ``v2Checkpoint``): UUID-named
top-level checkpoint files — json or parquet — whose file actions may
live in sidecar parquet files under ``_delta_log/_sidecars/``.
Fixtures are hand-authored the way a modern writer lays them out."""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from python_minerva_etl_spark.storage.delta import DeltaTable, read_delta

_SCHEMA_STR = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": True, "metadata": {}}]})

_PROTOCOL = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": ["v2Checkpoint"],
             "writerFeatures": ["v2Checkpoint"]}

_META = {"id": "m", "format": {"provider": "parquet", "options": {}},
         "schemaString": _SCHEMA_STR, "partitionColumns": [],
         "configuration": {}, "createdTime": 0}


def _data_file(p, name, values):
    pq.write_table(pa.table({"id": pa.array(values, pa.int64())}),
                   os.path.join(p, name))
    return {"path": name, "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_v2_checkpoint_json_inline_actions(spark, tmp_path):
    p = str(tmp_path / "t")
    log = os.path.join(p, "_delta_log")
    os.makedirs(log)
    a0 = _data_file(p, "f0.parquet", [1, 2])
    a1 = _data_file(p, "f1.parquet", [3])
    cp = os.path.join(
        log, f"{1:020d}.checkpoint.{uuid.uuid4()}.json")
    with open(cp, "w") as fh:
        for row in [{"checkpointMetadata": {"version": 1}},
                    {"protocol": _PROTOCOL}, {"metaData": _META},
                    {"add": a0}, {"add": a1}]:
            fh.write(json.dumps(row) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": 5}, fh)
    # no JSON commits at all: the v2 checkpoint must stand alone
    assert _rows(read_delta(spark, p)) == [(1,), (2,), (3,)]
    assert DeltaTable(p)._replay()["version"] == 1


def _sidecar(log, rows):
    sc_dir = os.path.join(log, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    name = f"{uuid.uuid4()}.parquet"
    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema([
        ("add", pa.struct([
            ("path", pa.string()), ("partitionValues", str_map),
            ("size", pa.int64()), ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_())])),
        ("remove", pa.struct([
            ("path", pa.string()), ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_())])),
    ])
    out = []
    for r in rows:
        base = {"add": None, "remove": None}
        for k, v in r.items():
            if k == "add" and v:
                v = dict(v, partitionValues=list(
                    (v.get("partitionValues") or {}).items()))
            base[k] = v
        out.append(base)
    pq.write_table(pa.Table.from_pylist(out, schema=schema),
                   os.path.join(sc_dir, name))
    return name


def _v2_parquet_top(log, version, sidecar_names):
    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema([
        ("checkpointMetadata", pa.struct([("version", pa.int64())])),
        ("protocol", pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string()))])),
        ("metaData", pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string()),
                                  ("options", str_map)])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", str_map),
            ("createdTime", pa.int64())])),
        ("sidecar", pa.struct([
            ("path", pa.string()), ("sizeInBytes", pa.int64()),
            ("modificationTime", pa.int64())])),
    ])
    base = {"checkpointMetadata": None, "protocol": None,
            "metaData": None, "sidecar": None}
    meta = dict(_META, format={"provider": "parquet", "options": []},
                configuration=[])
    rows = [dict(base, checkpointMetadata={"version": version}),
            dict(base, protocol=_PROTOCOL),
            dict(base, metaData=meta)]
    rows += [dict(base, sidecar={"path": n, "sizeInBytes": 1,
                                 "modificationTime": 0})
             for n in sidecar_names]
    cp = os.path.join(
        log, f"{version:020d}.checkpoint.{uuid.uuid4()}.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), cp)
    return cp


def test_v2_checkpoint_parquet_with_sidecars(spark, tmp_path):
    p = str(tmp_path / "t")
    log = os.path.join(p, "_delta_log")
    os.makedirs(log)
    a0 = _data_file(p, "f0.parquet", [1, 2])
    a1 = _data_file(p, "f1.parquet", [3, 4])
    _data_file(p, "gone.parquet", [99])
    s0 = _sidecar(log, [{"add": a0}])
    s1 = _sidecar(log, [
        {"add": a1},
        {"remove": {"path": "gone.parquet", "deletionTimestamp": 5,
                    "dataChange": True}}])
    _v2_parquet_top(log, 3, [s0, s1])
    # NO _last_checkpoint: directory-scan discovery must find it
    assert _rows(read_delta(spark, p)) == [(1,), (2,), (3,), (4,)]
    # a later JSON commit layers on top of the v2 checkpoint
    a2 = _data_file(p, "f2.parquet", [7])
    with open(os.path.join(log, f"{4:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": a2}) + "\n")
    assert _rows(read_delta(spark, p)) == [(1,), (2,), (3,), (4,),
                                           (7,)]
    # tombstone carried: the removed file stays gone either way
    snap = DeltaTable(p)._replay()
    assert "gone.parquet" in {t["path"] for t in snap["tombstones"]}


def test_v2_checkpoint_missing_sidecar_raises(spark, tmp_path):
    p = str(tmp_path / "t")
    log = os.path.join(p, "_delta_log")
    os.makedirs(log)
    _data_file(p, "f0.parquet", [1])
    _v2_parquet_top(log, 0, ["not-there.parquet"])
    with pytest.raises(ValueError, match="sidecar missing"):
        read_delta(spark, p)
