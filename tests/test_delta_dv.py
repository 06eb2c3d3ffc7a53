"""Delta deletion vectors: Z85 codec, portable RoaringBitmapArray,
the on-disk DV file layout, scan-time application, the merge-on-read
DELETE writer, protocol feature gating, and (path, DV id) action
reconciliation — all against the public delta.io PROTOCOL.md spec.

The foreign-fixture bytes in this file are hand-packed with struct
calls straight from the spec text (RoaringFormatSpec container
layouts, Z85 test vector from ZeroMQ RFC 32) — independent logic
from the library's encoder, so an encoder/decoder twin bug cannot
cancel out.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_minerva_etl_spark.storage.delta import (DeltaConcurrentCommit,
                                                    DeltaTable, delete_delta,
                                                    read_delta, write_delta)
from python_minerva_etl_spark.storage.delta_dv import (dv_load, dv_unique_id,
                                                       dv_write, rbm_decode,
                                                       rbm_encode, z85_decode,
                                                       z85_encode)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------- Z85

def test_z85_rfc32_test_vector():
    # ZeroMQ RFC 32's published example: 864FD26FB559F75B <-> HelloWorld
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


def test_z85_uuid_roundtrip_and_padding():
    u = uuid.UUID("01234567-89ab-cdef-0123-456789abcdef")
    enc = z85_encode(u.bytes)
    assert len(enc) == 20
    assert z85_decode(enc) == u.bytes
    # unaligned payloads zero-pad on encode; length-trim recovers them
    for n in range(1, 9):
        data = bytes(range(1, n + 1))
        assert z85_decode(z85_encode(data))[:n] == data
    with pytest.raises(ValueError):
        z85_decode("abcd")  # not a multiple of 5
    with pytest.raises(ValueError):
        z85_decode("~~~~~")  # not in the alphabet


# ------------------------------------- roaring portable (foreign)

_MAGIC = 1681511377


def _foreign_rbm32(containers):
    """Hand-pack one 32-bit roaring bitmap per RoaringFormatSpec.
    ``containers`` = list of (key16, kind, payload) where kind is
    'array' (payload: sorted values), 'bitmap' (payload: sorted
    values), or 'run' (payload: list of (start, length) runs)."""
    n = len(containers)
    has_runs = any(k == "run" for _, k, _ in containers)
    out = bytearray()
    if has_runs:
        out += struct.pack("<I", ((n - 1) << 16) | 12347)
        flags = bytearray((n + 7) // 8)
        for i, (_, kind, _) in enumerate(containers):
            if kind == "run":
                flags[i // 8] |= 1 << (i % 8)
        out += flags
    else:
        out += struct.pack("<Ii", 12346, n)
    cards = []
    for key, kind, payload in containers:
        card = (sum(ln for _, ln in payload) if kind == "run"
                else len(payload))
        cards.append(card)
        out += struct.pack("<HH", key, card - 1)
    blobs = []
    for key, kind, payload in containers:
        if kind == "run":
            b = struct.pack("<H", len(payload))
            for start, length in payload:
                b += struct.pack("<HH", start, length - 1)
        elif kind == "bitmap":
            bits = bytearray(8192)
            for v in payload:
                bits[v // 8] |= 1 << (v % 8)
            b = bytes(bits)
        else:
            b = b"".join(struct.pack("<H", v) for v in payload)
        blobs.append(b)
    if not has_runs or n >= 4:
        off = len(out) + 4 * n
        for b in blobs:
            out += struct.pack("<i", off)
            off += len(b)
    for b in blobs:
        out += b
    return bytes(out)


def _foreign_rbm64(maps):
    """``maps`` = list of (high32_key, containers)."""
    out = struct.pack("<iq", _MAGIC, len(maps))
    for key, containers in maps:
        out += struct.pack("<i", key) + _foreign_rbm32(containers)
    return out


def test_decode_foreign_array_and_bitmap_containers():
    dense = sorted(set(range(0, 65536, 7)))  # 9363 values > 4096
    data = _foreign_rbm64([
        (0, [(0, "array", [1, 5, 65535]),
             (3, "bitmap", dense)]),
        (2, [(1, "array", [0])]),
    ])
    got = rbm_decode(data)
    want = sorted([1, 5, 65535]
                  + [(3 << 16) | v for v in dense]
                  + [(2 << 32) | (1 << 16)])
    assert got.tolist() == want


def test_decode_foreign_run_containers():
    data = _foreign_rbm64([
        (1, [(2, "run", [(10, 3), (100, 1), (4000, 5)])]),
    ])
    got = rbm_decode(data)
    base = (1 << 32) | (2 << 16)
    want = [base + v for v in
            [10, 11, 12, 100, 4000, 4001, 4002, 4003, 4004]]
    assert got.tolist() == want


def test_decode_rejects_bad_magic_and_short_data():
    with pytest.raises(ValueError):
        rbm_decode(struct.pack("<iq", 123, 0))
    with pytest.raises(ValueError):
        rbm_decode(b"\x00\x01")


def test_encode_decode_roundtrip_across_container_kinds():
    rng = np.random.default_rng(7)
    positions = np.unique(np.concatenate([
        rng.integers(0, 1000, 50),                 # sparse array
        np.arange(200000, 210000),                 # dense -> bitmap
        rng.integers(int(5e9), int(5e9) + 100000, 3000),  # high key
    ]).astype(np.int64))
    data = rbm_encode(positions)
    assert rbm_decode(data).tolist() == positions.tolist()
    # empty set
    assert rbm_decode(rbm_encode([])).tolist() == []


# --------------------------------------------------- DV file layout

def test_dv_write_load_roundtrip(tmp_path):
    table = str(tmp_path)
    pos = [0, 5, 17, 100000, (1 << 33) + 7]
    # small bitmaps inline into the descriptor (storageType "i")
    desc = dv_write(table, pos)
    assert desc["storageType"] == "i"
    assert desc["cardinality"] == len(pos)
    assert dv_load(table, desc).tolist() == sorted(pos)
    assert not any(n.startswith("deletion_vector_")
                   for n in os.listdir(table))
    # past the inline threshold a .bin file materializes
    desc = dv_write(table, pos, inline_threshold=0)
    assert desc["storageType"] == "u"
    assert dv_load(table, desc).tolist() == sorted(pos)
    # the bin file exists under the spec name and starts with version 1
    u = uuid.UUID(bytes=z85_decode(desc["pathOrInlineDv"]))
    p = os.path.join(table, f"deletion_vector_{u}.bin")
    with open(p, "rb") as fh:
        assert fh.read(1) == b"\x01"
    # a genuinely large position set crosses the threshold by itself
    big = list(range(0, 40000, 2))
    desc = dv_write(table, big)
    assert desc["storageType"] == "u"
    assert dv_load(table, desc).tolist() == big


def test_dv_load_foreign_file_with_prefix_and_offset(tmp_path):
    """Hand-build a DV file exactly as the spec lays it out: version
    byte, then [size BE][data][crc BE] per DV — with a junk DV first
    so offset != 1, and a random directory prefix in
    pathOrInlineDv."""
    table = str(tmp_path)
    os.makedirs(os.path.join(table, "ab"))
    u = uuid.uuid4()
    junk = _foreign_rbm64([(0, [(0, "array", [9])])])
    data = _foreign_rbm64([(0, [(0, "array", [2, 4]),
                                (1, "run", [(0, 2)])])])
    blob = (b"\x01"
            + struct.pack(">i", len(junk)) + junk
            + struct.pack(">I", zlib.crc32(junk))
            + struct.pack(">i", len(data)) + data
            + struct.pack(">I", zlib.crc32(data)))
    with open(os.path.join(table, "ab",
                           f"deletion_vector_{u}.bin"), "wb") as fh:
        fh.write(blob)
    desc = {"storageType": "u",
            "pathOrInlineDv": "ab/" + z85_encode(u.bytes),
            "offset": 1 + 8 + len(junk),
            "sizeInBytes": len(data), "cardinality": 4}
    got = dv_load(table, desc)
    assert got.tolist() == [2, 4, (1 << 16), (1 << 16) + 1]
    # CRC corruption is caught
    bad = bytearray(blob)
    bad[-6] ^= 0xFF
    with open(os.path.join(table, "ab",
                           f"deletion_vector_{u}.bin"), "wb") as fh:
        fh.write(bytes(bad))
    with pytest.raises(ValueError, match="CRC"):
        dv_load(table, desc)


def test_dv_inline_and_cardinality_check(tmp_path):
    data = _foreign_rbm64([(0, [(0, "array", [3, 7, 11])])])
    desc = {"storageType": "i", "pathOrInlineDv": z85_encode(data),
            "sizeInBytes": len(data), "cardinality": 3}
    assert dv_load(str(tmp_path), desc).tolist() == [3, 7, 11]
    with pytest.raises(ValueError, match="cardinality"):
        dv_load(str(tmp_path),
                dict(desc, cardinality=5))


# ------------------------------------------- scan-time application

def _foreign_dv_table(tmp_path, spark):
    """A Delta table as a DV-writing engine would leave it: one data
    file, protocol (3,7) with deletionVectors, an add carrying a DV
    that masks rows 1 and 3 (0-based)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "foreign")
    os.makedirs(os.path.join(p, "_delta_log"))
    pq.write_table(
        pa.table({"id": pa.array([10, 11, 12, 13, 14],
                                 type=pa.int64())}),
        os.path.join(p, "part-0.parquet"))
    data = _foreign_rbm64([(0, [(0, "array", [1, 3])])])
    u = uuid.uuid4()
    with open(os.path.join(p, f"deletion_vector_{u}.bin"),
              "wb") as fh:
        fh.write(b"\x01" + struct.pack(">i", len(data)) + data
                 + struct.pack(">I", zlib.crc32(data)))
    schema = ('{"type":"struct","fields":[{"name":"id","type":"long",'
              '"nullable":true,"metadata":{}}]}')
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "m", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": {
                          "delta.enableDeletionVectors": "true"},
                      "createdTime": 0}},
        {"add": {"path": "part-0.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "deletionVector": {
                     "storageType": "u",
                     "pathOrInlineDv": z85_encode(u.bytes),
                     "offset": 1, "sizeInBytes": len(data),
                     "cardinality": 2}}},
    ]
    with open(os.path.join(p, "_delta_log",
                           f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return p


def test_read_foreign_table_with_deletion_vector(spark, tmp_path):
    p = _foreign_dv_table(tmp_path, spark)
    assert _rows(read_delta(spark, p)) == [(10,), (12,), (14,)]


def test_unknown_reader_feature_still_refused(spark, tmp_path):
    p = _foreign_dv_table(tmp_path, spark)
    log = os.path.join(p, "_delta_log", f"{0:020d}.json")
    with open(log) as fh:
        lines = [json.loads(l) for l in fh if l.strip()]
    lines[0]["protocol"]["readerFeatures"].append("typeWidening")
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta(spark, p).collect()


def test_dv_update_reconciliation_is_order_independent(spark,
                                                       tmp_path):
    """A DV update commits remove(path, old DV) + add(path, new DV).
    With the adversarial order — add first, remove second — a
    path-keyed replay would drop the file entirely; (path, DV id)
    keying must keep exactly the new-DV add."""
    p = _foreign_dv_table(tmp_path, spark)
    with open(os.path.join(p, "_delta_log",
                           f"{0:020d}.json")) as fh:
        v0 = [json.loads(l) for l in fh if l.strip()]
    old_add = next(a["add"] for a in v0 if "add" in a)
    # new DV masks only row 4
    data = _foreign_rbm64([(0, [(0, "array", [4])])])
    u = uuid.uuid4()
    with open(os.path.join(p, f"deletion_vector_{u}.bin"),
              "wb") as fh:
        fh.write(b"\x01" + struct.pack(">i", len(data)) + data
                 + struct.pack(">I", zlib.crc32(data)))
    new_add = dict(old_add, deletionVector={
        "storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
        "offset": 1, "sizeInBytes": len(data), "cardinality": 1})
    v1 = [{"add": new_add},
          {"remove": {"path": old_add["path"],
                      "deletionTimestamp": 1, "dataChange": True,
                      "deletionVector": old_add["deletionVector"]}}]
    with open(os.path.join(p, "_delta_log",
                           f"{1:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in v1) + "\n")
    assert _rows(read_delta(spark, p)) == [(10,), (11,), (12,),
                                           (13,)]
    assert dv_unique_id(old_add["deletionVector"]) != \
        dv_unique_id(new_add["deletionVector"])


def test_ambiguous_double_add_refused(spark, tmp_path):
    """Two active adds for one path with different DVs (a writer that
    forgot the remove) must raise, not silently pick one."""
    p = _foreign_dv_table(tmp_path, spark)
    with open(os.path.join(p, "_delta_log",
                           f"{0:020d}.json")) as fh:
        v0 = [json.loads(l) for l in fh if l.strip()]
    old_add = next(a["add"] for a in v0 if "add" in a)
    data = _foreign_rbm64([(0, [(0, "array", [0])])])
    new_add = dict(old_add, deletionVector={
        "storageType": "i", "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data), "cardinality": 1})
    with open(os.path.join(p, "_delta_log",
                           f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": new_add}) + "\n")
    with pytest.raises(ValueError, match="ambiguous"):
        read_delta(spark, p)


# ------------------------------------------------ DELETE writer

def test_delete_roundtrip_and_merge(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("m"))
    write_delta(spark, df, p)
    v = delete_delta(spark, p, "m = 3")
    assert v == 1
    got = read_delta(spark, p)
    assert got.count() == 90
    assert got.filter("m = 3").count() == 0
    # second delete on the SAME files must union with the old DV
    v2 = delete_delta(spark, p, "m = 7")
    assert v2 == 2
    got = read_delta(spark, p)
    assert got.count() == 80
    assert got.filter("m in (3, 7)").count() == 0
    # time travel still sees the intermediate and original states
    assert read_delta(spark, p, version_as_of=1).count() == 90
    assert read_delta(spark, p, version_as_of=0).count() == 100
    # re-delete of already-deleted rows is a commit-free no-op
    assert delete_delta(spark, p, "m = 3") is None
    assert DeltaTable(p).versions()[-1] == 2
    # protocol was upgraded with the feature and the implied set
    snap = DeltaTable(p)._replay()
    proto = snap["protocol"]
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    assert {"appendOnly", "invariants",
            "deletionVectors"} <= set(proto["writerFeatures"])
    # no data file was rewritten: the add paths at v2 == those at v0
    v0_files = {f["path"]
                for f in DeltaTable(p)._replay(0)["files"]}
    v2_files = {f["path"] for f in snap["files"]}
    assert v0_files == v2_files


def test_delete_then_append_then_delete(spark, tmp_path):
    """Appends after a DELETE stay fully visible; a later DELETE
    masks across old (DV-carrying) and new files alike."""
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame(
        [(1,), (2,), (3,)], "id long"), p)
    delete_delta(spark, p, "id = 2")
    write_delta(spark, spark.createDataFrame(
        [(2,), (4,)], "id long"), p)
    assert _rows(read_delta(spark, p)) == [(1,), (2,), (3,), (4,)]
    delete_delta(spark, p, "id >= 3")
    assert _rows(read_delta(spark, p)) == [(1,), (2,)]


def test_checkpoint_carries_deletion_vectors(spark, tmp_path):
    """Replay from checkpoint ONLY (JSON commits removed) must keep
    the DVs and the real protocol — a (1,2)-hardcoding checkpoint
    would resurrect the deleted rows for feature-aware readers and
    hide the feature gate from naive ones."""
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 50).toDF("id"), p)
    delete_delta(spark, p, "id < 10")
    dt = DeltaTable(p)
    dt._write_checkpoint(dt.versions()[-1])
    # drop every JSON commit: the checkpoint must stand alone
    log = os.path.join(p, "_delta_log")
    for name in os.listdir(log):
        if name.endswith(".json") and not name.startswith("_"):
            os.remove(os.path.join(log, name))
    got = read_delta(spark, p)
    assert got.count() == 40
    assert got.filter("id < 10").count() == 0
    proto = dt._replay()["protocol"]
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]


def test_delete_on_partitioned_table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")],
        "id long, part string")
    DeltaTable(p).write(spark, df, partition_by=["part"])
    delete_delta(spark, p, "id in (2, 3)")
    assert _rows(read_delta(spark, p)) == [(1, "a"), (4, "b")]


def test_overwrite_drops_dv_files_cleanly(spark, tmp_path):
    """Overwrite after a DELETE: removes must reference the DV id or
    the old (path, DV) add would survive reconciliation."""
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame(
        [(1,), (2,)], "id long"), p)
    delete_delta(spark, p, "id = 1")
    write_delta(spark, spark.createDataFrame(
        [(9,)], "id long"), p, mode="overwrite")
    assert _rows(read_delta(spark, p)) == [(9,)]


def test_append_only_table_refuses_delete(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.createDataFrame([(1,)], "id long"), p)
    # flip the table property the way a foreign engine would
    log = os.path.join(p, "_delta_log", f"{0:020d}.json")
    with open(log) as fh:
        lines = [json.loads(l) for l in fh if l.strip()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.appendOnly": "true"}
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(ValueError, match="append-only"):
        delete_delta(spark, p, "id = 1")
    with pytest.raises(ValueError, match="append-only"):
        write_delta(spark, spark.createDataFrame(
            [(2,)], "id long"), p, mode="overwrite")
    # appends stay allowed
    write_delta(spark, spark.createDataFrame([(2,)], "id long"), p)
    assert _rows(read_delta(spark, p)) == [(1,), (2,)]


def test_unknown_writer_feature_refuses_write(spark, tmp_path):
    p = _foreign_dv_table(tmp_path, spark)
    log = os.path.join(p, "_delta_log", f"{0:020d}.json")
    with open(log) as fh:
        lines = [json.loads(l) for l in fh if l.strip()]
    lines[0]["protocol"]["writerFeatures"].append("rowTracking")
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(NotImplementedError, match="rowTracking"):
        write_delta(spark, spark.createDataFrame(
            [(1,)], "id long"), p)
    # reading stays fine: rowTracking is writer-side only
    assert read_delta(spark, p).count() == 3
