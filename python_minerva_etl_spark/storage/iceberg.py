"""Apache Iceberg read interop without the Iceberg runtime jar.

Delta's transaction-log twin (``storage/delta.py``) landed in round
4; at 100 TB the OTHER half of the lakehouse ecosystem is Iceberg,
so this module implements the read path of the published Iceberg
table spec (https://iceberg.apache.org/spec/), stdlib + pyarrow
only:

- **table metadata**: ``metadata/v<N>.metadata.json`` (resolved via
  ``version-hint.text`` or a directory scan), format-version 1 and
  2 — current snapshot or ``snapshot_id`` time travel;
- **manifest list + manifests**: Apache Avro object-container files
  (magic ``Obj\\x01``, header metadata map, sync-delimited blocks),
  decoded by a from-scratch generic Avro reader driven by the
  embedded writer schema (:func:`avro_read`) — zigzag varints,
  blocked arrays/maps, unions, nested records, null/deflate codecs
  (snappy via pyarrow when available);
- **schema**: Iceberg JSON schema converted to a Spark
  ``StructType`` (primitives, decimal, struct/list/map);
- **scan**: the live data-file set (``status != DELETED`` entries,
  existing + added) read as parquet with the converted schema.

Honest refusals (raise, never misread):

- v2 **delete files** (position/equality): a snapshot with live
  delete files cannot be answered correctly by a plain parquet scan;
- non-parquet data files (Avro/ORC data files are legal per spec);
- renamed columns: Iceberg resolves columns by field id, this reader
  by name — every scanned file's parquet footer must contain every
  top-level schema name, else the read raises instead of returning
  silent nulls;
- unknown Avro codecs.

Write path: out of scope this round (Delta is the interop write
target); SnapTable.export_delta covers publishing.

Reference parity: the reference system (hendrikx-itc/
python-minerva-etl) stores everything in PostgreSQL and has no lake
format; this backs SURVEY §2 OP-SRC interop at 100 TB scale.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_AVRO_MAGIC = b"Obj\x01"


# ------------------------------------------------------------------ avro

class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("avro: truncated input")
        self.pos += n
        return b

    def read_long(self) -> int:
        """Zigzag varint (Avro spec 'Binary encoding / primitives')."""
        shift = acc = 0
        while True:
            (b,) = self.read(1)
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _resolve_named(schema, names):
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _decode(cur: _Cursor, schema, names: dict):
    """Decode one datum per the writer schema (Avro 1.11 binary
    encoding).  ``names`` carries previously defined named types so
    references decode correctly."""
    schema = _resolve_named(schema, names)
    if isinstance(schema, list):  # union: branch index then value
        idx = cur.read_long()
        return _decode(cur, schema[idx], names)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return cur.read(1) != b"\x00"
        if t in ("int", "long"):
            return cur.read_long()
        if t == "float":
            return struct.unpack("<f", cur.read(4))[0]
        if t == "double":
            return struct.unpack("<d", cur.read(8))[0]
        if t == "bytes":
            return cur.read(cur.read_long())
        if t == "string":
            return cur.read(cur.read_long()).decode("utf-8")
        raise ValueError(f"avro: unknown primitive {t!r}")
    t = schema["type"]
    if t == "record":
        if schema.get("name"):
            names[schema["name"]] = schema
        return {f["name"]: _decode(cur, f["type"], names)
                for f in schema["fields"]}
    if t == "enum":
        if schema.get("name"):
            names[schema["name"]] = schema
        return schema["symbols"][cur.read_long()]
    if t == "fixed":
        if schema.get("name"):
            names[schema["name"]] = schema
        return cur.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = cur.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                cur.read_long()
            for _ in range(n):
                out.append(_decode(cur, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = cur.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                cur.read_long()
            for _ in range(n):
                k = cur.read(cur.read_long()).decode("utf-8")
                out[k] = _decode(cur, schema["values"], names)
    if t in ("null", "boolean", "int", "long", "float", "double",
             "bytes", "string"):
        return _decode(cur, t, names)  # {"type": "long"} wrapper form
    raise ValueError(f"avro: unsupported schema {t!r}")


def avro_read(payload: bytes) -> tuple[dict, list]:
    """Decode an Avro object-container file: returns
    (header_metadata, records).  null and deflate codecs via stdlib;
    snappy through pyarrow when present."""
    cur = _Cursor(payload)
    if cur.read(4) != _AVRO_MAGIC:
        raise ValueError("not an Avro object-container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(cur, meta_schema, {})
    sync = cur.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records = []
    while cur.pos < len(cur.buf):
        n = cur.read_long()
        size = cur.read_long()
        block = cur.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            block = _snappy(block)
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec!r}")
        bcur = _Cursor(block)
        names: dict = {}
        for _ in range(n):
            records.append(_decode(bcur, schema, names))
        if cur.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    return meta, records


def _snappy(block: bytes) -> bytes:
    """Avro-snappy blocks: raw snappy body + big-endian CRC32 of the
    UNCOMPRESSED data.  Raw snappy's leading varint is the
    uncompressed length, which pyarrow's decompressor needs."""
    import pyarrow as pa
    body, crc = block[:-4], block[-4:]
    size = shift = i = 0
    while True:
        b = body[i]
        size |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            break
        shift += 7
    out = pa.decompress(body, decompressed_size=size, codec="snappy")
    data = out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)
    if struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise ValueError("avro: snappy block CRC mismatch")
    return data


# ------------------------------------------------------------------ schema

_PRIM = {
    "boolean": T.BooleanType(), "int": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(),
    "double": T.DoubleType(), "string": T.StringType(),
    "binary": T.BinaryType(), "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "uuid": T.StringType(), "time": T.LongType(),
}


def _iceberg_type(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIM:
            return _PRIM[t]
        if t.startswith("decimal("):
            p, s = t[8:-1].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed["):
            return T.BinaryType()
        raise ValueError(f"iceberg: unsupported type {t!r}")
    k = t["type"]
    if k == "struct":
        return T.StructType([
            T.StructField(f["name"], _iceberg_type(f["type"]),
                          not f.get("required", False))
            for f in t["fields"]])
    if k == "list":
        return T.ArrayType(_iceberg_type(t["element"]),
                           not t.get("element-required", False))
    if k == "map":
        return T.MapType(_iceberg_type(t["key"]),
                         _iceberg_type(t["value"]),
                         not t.get("value-required", False))
    raise ValueError(f"iceberg: unsupported type {k!r}")


def _to_spark_schema(ice_schema: dict) -> T.StructType:
    return T.StructType([
        T.StructField(f["name"], _iceberg_type(f["type"]),
                      not f.get("required", False))
        for f in ice_schema["fields"]])


# ------------------------------------------------------------------ table

def _localize(uri: str) -> str:
    if uri.startswith("file://"):
        return uri[len("file://"):]
    return uri


class IcebergTable:
    """An Iceberg table rooted at ``path`` — metadata + manifest
    replay, parquet scan of the live file set."""

    def __init__(self, path: str):
        self.path = path
        self._mdir = os.path.join(path, "metadata")

    def _metadata_path(self) -> str:
        hint = os.path.join(self._mdir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                v = fh.read().strip()
            for name in (f"v{v}.metadata.json", f"{v}.metadata.json"):
                p = os.path.join(self._mdir, name)
                if os.path.exists(p):
                    return p
        cands = sorted(
            n for n in os.listdir(self._mdir)
            if n.endswith(".metadata.json"))
        if not cands:
            raise FileNotFoundError(
                f"no Iceberg metadata under {self._mdir!r}")
        return os.path.join(self._mdir, cands[-1])

    def metadata(self) -> dict:
        with open(self._metadata_path()) as fh:
            md = json.load(fh)
        fv = md.get("format-version", 1)
        if fv not in (1, 2):
            raise NotImplementedError(
                f"iceberg: format-version {fv} unsupported (1 and 2 only)")
        return md

    def _current_schema(self, md: dict) -> dict:
        if "schemas" in md:
            sid = md.get("current-schema-id", 0)
            for s in md["schemas"]:
                if s.get("schema-id") == sid:
                    return s
            return md["schemas"][0]
        return md["schema"]  # v1 single-schema form

    def schema(self) -> T.StructType:
        return _to_spark_schema(self._current_schema(self.metadata()))

    def _snapshot(self, md: dict, snapshot_id: int | None) -> dict:
        snaps = md.get("snapshots") or []
        if snapshot_id is None:
            cur = md.get("current-snapshot-id")
            if cur in (None, -1):
                return {}
            snapshot_id = cur
        for s in snaps:
            if s.get("snapshot-id") == snapshot_id:
                return s
        raise ValueError(
            f"iceberg: snapshot {snapshot_id} not in metadata (have "
            f"{[s.get('snapshot-id') for s in snaps]})")

    def _data_files(self, snap: dict) -> list[dict]:
        """Live data-file entries for a snapshot: replay its manifest
        list, then every manifest, keeping EXISTING/ADDED entries.
        Delete manifests (v2 content=1) or delete data files
        (content 1/2) are refused — a plain scan would return rows a
        real Iceberg reader deletes."""
        if not snap:
            return []
        if "manifest-list" in snap:
            with open(_localize(snap["manifest-list"]), "rb") as fh:
                _, entries = avro_read(fh.read())
            manifests = entries
        else:  # legacy v1 inline manifests list
            manifests = [{"manifest_path": p} for p in
                         snap.get("manifests", [])]
        out: list[dict] = []
        for m in manifests:
            if m.get("content", 0) == 1:
                raise NotImplementedError(
                    "iceberg: delete manifests unsupported (a plain "
                    "parquet scan would resurrect deleted rows)")
            with open(_localize(m["manifest_path"]), "rb") as fh:
                _, recs = avro_read(fh.read())
            for r in recs:
                if r.get("status") == 2:  # DELETED entry
                    continue
                df = r["data_file"]
                content = df.get("content", 0)
                if content != 0:
                    raise NotImplementedError(
                        "iceberg: position/equality delete files "
                        "unsupported — refusing a read that would "
                        "return deleted rows")
                fmt = (df.get("file_format") or "").upper()
                if fmt != "PARQUET":
                    raise NotImplementedError(
                        f"iceberg: {fmt or '?'} data files unsupported "
                        "(parquet only)")
                out.append(df)
        return out

    def read(self, spark: SparkSession,
             snapshot_id: int | None = None) -> DataFrame:
        """Snapshot read (optionally time-traveled by snapshot id).
        Column resolution is BY NAME (Iceberg's is by field id):
        every scanned file's parquet footer must contain every
        top-level schema column, else raise — a renamed column would
        otherwise come back as silent nulls."""
        md = self.metadata()
        schema = _to_spark_schema(self._current_schema(md))
        files = self._data_files(self._snapshot(md, snapshot_id))
        if not files:
            return spark.createDataFrame([], schema)
        paths = [_localize(f["file_path"]) for f in files]
        want = {f.name for f in schema.fields}
        import pyarrow.parquet as pq
        for p in paths:
            if os.path.exists(p):
                have = set(pq.ParquetFile(p).schema_arrow.names)
                missing = want - have
                if missing:
                    raise ValueError(
                        f"iceberg: file {os.path.basename(p)!r} lacks "
                        f"columns {sorted(missing)} — the table was "
                        "likely column-renamed (field-id resolution), "
                        "which this name-based reader refuses rather "
                        "than returning nulls")
        return spark.read.schema(schema).parquet(*paths)


def read_iceberg(spark: SparkSession, path: str,
                 snapshot_id: int | None = None) -> DataFrame:
    """Read an Iceberg table (see :class:`IcebergTable.read`)."""
    return IcebergTable(path).read(spark, snapshot_id)
