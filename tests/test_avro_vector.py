"""Vectorized Avro block decode: the numpy fast path must be
byte-exact with the sequential decoder on every eligible shape, and
must never claim files it cannot decode exactly."""

from __future__ import annotations

import datetime
import json
import os
import random

from python_minerva_etl_spark.sources.avro import (_vector_plan,
                                                   read_avro)
from tests.test_iceberg import _avro_file, _enc, _zz


def _multi_block(schema, records, per_block=3):
    sync = bytes(range(16))
    out = bytearray(b"Obj\x01")
    out += _enc({"avro.schema": json.dumps(schema).encode(),
                 "avro.codec": b"null"},
                {"type": "map", "values": "bytes"})
    out += sync
    for i in range(0, len(records), per_block):
        chunk = records[i:i + per_block]
        body = b"".join(_enc(r, schema) for r in chunk)
        out += _zz(len(chunk)) + _zz(len(body)) + body + sync
    return bytes(out)


_ALL_VARINT = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "small", "type": "int"},
    {"name": "flag", "type": "boolean"},
    {"name": "kind", "type": {"type": "enum", "name": "K",
                              "symbols": ["A", "B", "C"]}},
    {"name": "d", "type": {"type": "int", "logicalType": "date"}},
    {"name": "ts", "type": {"type": "long",
                            "logicalType": "timestamp-micros"}},
    {"name": "tms", "type": {"type": "long",
                             "logicalType": "timestamp-millis"}},
]}


def test_vector_plan_eligibility():
    assert _vector_plan(_ALL_VARINT) is not None
    # strings, floats, nullable unions, nesting: all fall back
    for bad in ("string", "double", "bytes", ["null", "long"],
                {"type": "array", "items": "long"}):
        s = {"type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"}, {"name": "x", "type": bad}]}
        assert _vector_plan(s) is None


def test_vector_path_matches_sequential_exactly(spark, tmp_path):
    rng = random.Random(7)
    recs = []
    for i in range(500):
        recs.append({
            # bias toward multi-byte + negative varints
            "id": rng.choice([0, -1, 1, 63, -64, 64, 2**31,
                              -2**31, 2**62, -2**62,
                              rng.randint(-2**63, 2**63 - 1)]),
            "small": rng.randint(-2**31, 2**31 - 1),
            "flag": rng.random() < 0.5,
            "kind": rng.choice(["A", "B", "C"]),
            "d": rng.randint(-10000, 30000),
            "ts": rng.randint(0, 2**48),
            "tms": rng.randint(0, 2**44),
        })
    d = tmp_path / "av"
    os.makedirs(d)
    (d / "p0.avro").write_bytes(_multi_block(_ALL_VARINT, recs[:300]))
    (d / "p1.avro").write_bytes(
        _avro_file(_ALL_VARINT, recs[300:], codec="deflate"))

    epoch_d = datetime.date(1970, 1, 1)
    epoch_t = datetime.datetime(1970, 1, 1)
    got = sorted(
        (r["id"], r["small"], r["flag"], r["kind"], r["d"], r["ts"],
         r["tms"])
        for r in read_avro(spark, str(d)).collect())
    want = sorted(
        (w["id"], w["small"], w["flag"], w["kind"],
         epoch_d + datetime.timedelta(days=w["d"]),
         epoch_t + datetime.timedelta(microseconds=w["ts"]),
         epoch_t + datetime.timedelta(milliseconds=w["tms"]))
        for w in recs)
    assert got == want


def test_vector_path_empty_and_single_row(spark, tmp_path):
    d = tmp_path / "av"
    os.makedirs(d)
    (d / "empty.avro").write_bytes(_avro_file(_ALL_VARINT, []))
    assert read_avro(spark, str(d)).count() == 0
    one = [{"id": -(2**63), "small": -1, "flag": True, "kind": "C",
            "d": 0, "ts": 1, "tms": 2}]
    (d / "one.avro").write_bytes(_avro_file(_ALL_VARINT, one))
    rows = read_avro(spark, str(d)).collect()
    assert len(rows) == 1 and rows[0]["id"] == -(2**63)


def test_write_avro_roundtrip_and_refusals(spark, tmp_path):
    """Executor-side Avro sink: lossless roundtrip incl. nulls, and
    loud refusals for unsupported types / nulls under
    force_required."""
    import pytest
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.sources.avro import (read_avro,
                                                       write_avro)

    df = spark.createDataFrame(
        [(1, 2.5, True, "a", None), (2, None, False, None, b"\x01")],
        "id long, x double, f boolean, s string, b binary")
    d = str(tmp_path / "out")
    files = write_avro(df.repartition(2), d)
    assert files and all(p.endswith(".avro") for p in files)
    got = sorted((r["id"], r["x"], r["f"], r["s"], bytes(r["b"])
                  if r["b"] is not None else None)
                 for r in read_avro(spark, d).collect())
    assert got == [(1, 2.5, True, "a", None),
                   (2, None, False, None, b"\x01")]

    # unsupported type refused at schema time
    with pytest.raises(NotImplementedError, match="unix_micros"):
        write_avro(spark.createDataFrame(
            [([1],)], "a array<long>"), str(tmp_path / "bad"))

    # force_required: null in a required column raises executor-side
    with pytest.raises(Exception, match="required column"):
        write_avro(spark.createDataFrame(
            [(1, None)], "id long, s string"),
            str(tmp_path / "bad2"), force_required=True)


def test_write_avro_force_required_hits_vector_path(spark, tmp_path):
    """force_required writes plain long schemas, which the vectorized
    reader claims (the plan is non-None) — and values round-trip."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.sources.avro import (_vector_plan,
                                                       read_avro,
                                                       write_avro)
    from python_minerva_etl_spark.storage.iceberg import avro_read

    df = spark.range(100).select(
        "id", (F.col("id") * 7 - 350).alias("v"))
    d = str(tmp_path / "out")
    (f0, *_) = write_avro(df, d, force_required=True)
    import json
    meta, _recs = avro_read(open(f0, "rb").read())
    schema = json.loads(meta["avro.schema"].decode())
    assert _vector_plan(schema) is not None
    got = sorted((r["id"], r["v"])
                 for r in read_avro(spark, d).collect())
    assert got == [(i, i * 7 - 350) for i in range(100)]


def test_write_avro_deflate_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.sources.avro import (read_avro,
                                                       write_avro)
    df = spark.range(500).select("id", (F.col("id") * 3).alias("v"))
    d = str(tmp_path / "out")
    write_avro(df, d, force_required=True, codec="deflate")
    got = sorted((r["id"], r["v"])
                 for r in read_avro(spark, d).collect())
    assert got == [(i, i * 3) for i in range(500)]
    import pytest
    with pytest.raises(ValueError, match="codec"):
        write_avro(df, str(tmp_path / "bad"), codec="zstd")
