"""Avro object-container files as a Spark source — no spark-avro jar.

Built on the same from-scratch Avro decoder as the Iceberg interop
(:func:`storage.iceberg.avro_read`, Avro 1.11 spec).  The read is
DISTRIBUTED: the driver touches only the FIRST file's header (to
derive the Spark schema); decoding runs as one ``mapInPandas`` task
per file, so at 100 TB the bytes never pass through the driver and
files decode in parallel across executors.  Every task re-checks its
file's embedded writer schema against the driver's and raises on
drift (mixed-schema directories must fail loudly, not coerce).

Schema scope (raise otherwise — never silently misread):

- top-level ``record``; fields of primitives, ``record`` (nested),
  ``array``, ``map`` (string keys, per Avro), ``enum`` (→ string),
  ``fixed`` (→ binary);
- unions ONLY of the ``["null", X]`` nullable form;
- logical types: ``decimal`` (bytes/fixed → DecimalType),
  ``date`` (int days → DateType), ``timestamp-micros`` /
  ``timestamp-millis`` (long → TimestampType, UTC).

Registered as source plugin ``avro`` (``sources/plugins.py``).
"""

from __future__ import annotations

import datetime
import decimal
import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def _field_type(schema) -> tuple[T.DataType, bool]:
    """(spark type, nullable) for one Avro field schema."""
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if "null" not in schema or len(branches) != 1:
            raise ValueError(
                f"avro: only ['null', X] unions supported, got {schema}")
        t, _ = _field_type(branches[0])
        return t, True
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _PRIMITIVES[schema], False
        raise ValueError(f"avro: unsupported type {schema!r}")
    lt = schema.get("logicalType")
    base = schema["type"]
    if lt == "decimal":
        return T.DecimalType(schema["precision"],
                             schema.get("scale", 0)), False
    if lt == "date" and base == "int":
        return T.DateType(), False
    if lt in ("timestamp-micros", "timestamp-millis") and base == "long":
        return T.TimestampType(), False
    if base == "record":
        return _record_type(schema), False
    if base == "array":
        t, n = _field_type(schema["items"])
        return T.ArrayType(t, n), False
    if base == "map":
        t, n = _field_type(schema["values"])
        return T.MapType(T.StringType(), t, n), False
    if base == "enum":
        return T.StringType(), False
    if base == "fixed":
        return T.BinaryType(), False
    if base in _PRIMITIVES:
        return _PRIMITIVES[base], False  # {"type": "long"} wrapper
    raise ValueError(f"avro: unsupported type {base!r}")


def _record_type(schema: dict) -> T.StructType:
    fields = []
    for f in schema["fields"]:
        dtype, nullable = _field_type(f["type"])
        fields.append(T.StructField(f["name"], dtype, nullable))
    return T.StructType(fields)


def _convert(value, schema):
    """Decoded Avro datum → the Python value Spark expects for the
    converted type (logical-type reinterpretation + nested walk)."""
    if value is None:
        return None
    if isinstance(schema, list):
        branch = next(s for s in schema if s != "null")
        return _convert(value, branch)
    if isinstance(schema, str):
        return value
    lt = schema.get("logicalType")
    base = schema["type"]
    if lt == "decimal":
        unscaled = int.from_bytes(value, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-schema.get("scale", 0))
    if lt == "date" and base == "int":
        return _EPOCH_DATE + datetime.timedelta(days=value)
    if lt == "timestamp-micros" and base == "long":
        return _EPOCH_TS + datetime.timedelta(microseconds=value)
    if lt == "timestamp-millis" and base == "long":
        return _EPOCH_TS + datetime.timedelta(milliseconds=value)
    if base == "record":
        return {f["name"]: _convert(value.get(f["name"]), f["type"])
                for f in schema["fields"]}
    if base == "array":
        return [_convert(v, schema["items"]) for v in value]
    if base == "map":
        return {k: _convert(v, schema["values"])
                for k, v in value.items()}
    return value


# ------------------------------------------------- vectorized fast path
#
# The sequential decoder reads one byte at a time in Python (~1 MB/s
# per worker — PERF.md).  For the common analytics shape — a record
# of NON-NULLABLE varint-encoded scalars (int, long, boolean, enum,
# date, timestamp-millis/micros) — every byte of a block body belongs
# to exactly one varint (boolean's single 0x00/0x01 byte is a valid
# one-byte varint), so a whole block decodes with numpy:
#
#   1. varint boundaries = bytes with the high bit clear;
#   2. per-varint magnitude = one np.add.reduceat over the 7-bit
#      groups shifted into place;
#   3. zigzag / boolean / logical-type reinterpretation per COLUMN
#      after reshaping to (n_records, n_fields).
#
# Anything outside that shape (strings, bytes, floats, nullable
# unions, nesting) falls back to the exact sequential decoder — the
# fast path either applies to a file or it doesn't; it never guesses.

_VARINT_ZIGZAG = {"int", "long"}


def _vector_plan(schema: dict):
    """Per-field decode plan if every field is vectorizable, else
    None.  Plan entries: ("zigzag"|"boolean"|"enum"|"date"|
    "ts-micros"|"ts-millis", extra)."""
    plan = []
    for f in schema["fields"]:
        s = f["type"]
        if isinstance(s, str):
            if s in _VARINT_ZIGZAG:
                plan.append(("zigzag", None))
                continue
            if s == "boolean":
                plan.append(("boolean", None))
                continue
            return None
        if isinstance(s, dict):
            lt = s.get("logicalType")
            base = s["type"]
            if lt == "date" and base == "int":
                plan.append(("date", None))
                continue
            if lt == "timestamp-micros" and base == "long":
                plan.append(("ts-micros", None))
                continue
            if lt == "timestamp-millis" and base == "long":
                plan.append(("ts-millis", None))
                continue
            if base == "enum":
                plan.append(("enum", list(s["symbols"])))
                continue
            if base in _VARINT_ZIGZAG and lt is None:
                plan.append(("zigzag", None))
                continue
        return None
    return plan


def _decode_block_vectorized(body: bytes, n_records: int, plan):
    """One block body -> list of per-field numpy/pandas columns."""
    import numpy as np

    nfields = len(plan)
    if n_records == 0:
        return [np.empty(0, dtype=np.int64) for _ in plan]
    b = np.frombuffer(body, dtype=np.uint8)
    if len(b) == 0 or (b[-1] & 0x80):
        raise ValueError("avro: truncated varint block")
    ends = np.flatnonzero((b & 0x80) == 0)
    if len(ends) != n_records * nfields:
        raise ValueError(
            f"avro: block claims {n_records} records x {nfields} "
            f"fields but contains {len(ends)} varints")
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # shift each byte's 7-bit group into place, then sum per varint.
    # Group offsets never exceed 9 (10-byte max varint), so the shift
    # fits uint64; np.add.reduceat sums disjoint bit ranges exactly.
    group = np.zeros(len(b), dtype=np.int64)
    np.add.at(group, starts[1:], 1)
    group = np.cumsum(group)
    offset = np.arange(len(b), dtype=np.int64) - starts[group]
    shifted = ((b & 0x7F).astype(np.uint64)
               << (7 * offset).astype(np.uint64))
    u = np.add.reduceat(shifted, starts)
    mat = u.reshape(n_records, nfields)
    cols = []
    for i, (kind, extra) in enumerate(plan):
        raw = mat[:, i]
        if kind == "boolean":
            cols.append(raw != 0)
            continue
        # zigzag (Avro spec: int/long/enum-index/date/timestamps are
        # all written as zigzag varints; enum indexes are >= 0 so
        # zigzag is a no-op-safe decode there too)
        val = ((raw >> np.uint64(1)).astype(np.int64)
               ^ -((raw & np.uint64(1)).astype(np.int64)))
        if kind == "enum":
            sym = np.asarray(extra, dtype=object)
            cols.append(sym[val])
        elif kind == "date":
            # datetime64[D] -> datetime.date objects; unlike
            # pd.to_datetime (ns-resolution) this never overflows
            # inside the full Avro date range
            cols.append(val.astype("datetime64[D]").astype(object))
        elif kind == "ts-micros":
            cols.append(val.astype("datetime64[us]"))
        elif kind == "ts-millis":
            cols.append(val.astype("datetime64[ms]")
                        .astype("datetime64[us]"))
        else:
            cols.append(val)
    return cols


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        out = sorted(glob.glob(os.path.join(path, "*.avro")))
    else:
        out = sorted(glob.glob(path)) or (
            [path] if os.path.exists(path) else [])
    if not out:
        raise FileNotFoundError(f"no .avro files at {path!r}")
    return out


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read ``path`` (a file, glob, or directory of ``*.avro``) as a
    DataFrame.  Driver reads one header; executors decode one file
    per task and refuse files whose writer schema differs."""
    import json as _json

    from ..storage.iceberg import avro_read

    files = _list_files(path)
    with open(files[0], "rb") as fh:
        meta, _ = avro_read(fh.read())
    writer_schema = _json.loads(meta["avro.schema"].decode("utf-8"))
    if not (isinstance(writer_schema, dict)
            and writer_schema.get("type") == "record"):
        raise ValueError("avro: top-level schema must be a record")
    spark_schema = _record_type(writer_schema)
    canon = _json.dumps(writer_schema, sort_keys=True)

    plan = _vector_plan(writer_schema)
    colnames = [f["name"] for f in writer_schema["fields"]]

    def decode(batches):
        import pandas as pd

        from ..storage.iceberg import avro_blocks

        def check_schema(m, p):
            if _json.dumps(_json.loads(
                    m["avro.schema"].decode("utf-8")),
                    sort_keys=True) != canon:
                raise ValueError(
                    f"avro: {os.path.basename(p)!r} writer schema "
                    "differs from the directory's first file — "
                    "mixed-schema reads are refused")

        for pdf in batches:
            for p in pdf["path"]:
                if plan is not None:
                    import numpy as np
                    with open(p, "rb") as fh:
                        m, blocks = avro_blocks(fh.read())
                    check_schema(m, p)
                    per_block = [
                        _decode_block_vectorized(body, n, plan)
                        for n, body in blocks if n]
                    if not per_block:
                        yield pd.DataFrame(columns=colnames)
                        continue
                    cols = [np.concatenate([blk[i]
                                            for blk in per_block])
                            for i in range(len(plan))]
                    yield pd.DataFrame(dict(zip(colnames, cols)))
                    continue
                with open(p, "rb") as fh:
                    m, recs = avro_read(fh.read())
                check_schema(m, p)
                rows = [tuple(_convert(r.get(f["name"]), f["type"])
                              for f in writer_schema["fields"])
                        for r in recs]
                yield pd.DataFrame(rows, columns=colnames)

    fdf = (spark.createDataFrame([(p,) for p in files], "path string")
           .repartition(len(files)))
    return fdf.mapInPandas(decode, spark_schema)


# ------------------------------------------------------------------ sink

_SINK_PRIM = {  # Spark simpleString -> Avro primitive
    "boolean": "boolean", "int": "int", "bigint": "long",
    "float": "float", "double": "double", "string": "string",
    "binary": "bytes",
}


def _avro_schema_of(spark_schema, force_required: bool) -> dict:
    """Spark schema -> Avro record schema for :func:`write_avro`.
    Scope: flat records of primitives (nullable -> ['null', X]);
    anything else raises — encode timestamps as ``unix_micros`` longs
    before writing (timezone-proof both ways) rather than relying on
    session-local pandas timestamps."""
    fields = []
    for f in spark_schema.fields:
        s = f.dataType.simpleString()
        if s not in _SINK_PRIM:
            raise NotImplementedError(
                f"avro sink: unsupported column type {s!r} for "
                f"{f.name!r} (flat primitives only; cast timestamps "
                "to unix_micros longs first)")
        avro_t = _SINK_PRIM[s]
        fields.append({"name": f.name,
                       "type": ["null", avro_t]
                       if f.nullable and not force_required
                       else avro_t})
    return {"type": "record", "name": "row", "fields": fields}


def write_avro(df: DataFrame, path: str,
               force_required: bool = False,
               codec: str = "null") -> list[str]:
    """Distributed Avro sink: one object-container file per non-empty
    partition, encoded executor-side (the driver never sees row
    data — only the bounded per-file summary).  Returns the written
    file paths.  Pairs with :func:`read_avro` for a lossless
    round-trip of the supported primitive types.

    ``force_required`` writes plain (non-union) field schemas even
    for Spark-nullable columns — use when the data is known non-null
    (e.g. key columns) so all-varint files stay eligible for the
    vectorized read path; an actual null then raises at encode time
    instead of silently writing an unreadable file.

    ``codec``: "null" (default) or "deflate" (raw zlib per the Avro
    spec — what most production writers emit)."""
    import json as _json
    import uuid as _uuid

    if codec not in ("null", "deflate"):
        raise ValueError(
            f"avro sink: unsupported codec {codec!r} (null/deflate)")

    from ..storage.iceberg_write import _avro_encode, _zigzag

    schema = _avro_schema_of(df.schema, force_required)
    canon = _json.dumps(schema).encode()
    os.makedirs(path, exist_ok=True)
    fields = [(f["name"], f["type"]) for f in schema["fields"]]

    def encode(batches):
        import pandas as pd
        sync = _uuid.uuid4().bytes
        out = bytearray(b"Obj\x01")
        out += _avro_encode(
            {"avro.schema": canon, "avro.codec": codec.encode()},
            {"type": "map", "values": "bytes"})
        out += sync
        n_total = 0
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            body = bytearray()
            cols = [pdf[name] for name, _ in fields]
            for i in range(n):
                for (name, ftype), col in zip(fields, cols):
                    v = col.iloc[i]
                    if v is not None and v == v:  # NaN -> null
                        v = v.item() if hasattr(v, "item") else v
                    else:
                        v = None
                    if v is None and not isinstance(ftype, list):
                        raise ValueError(
                            f"avro sink: null in required column "
                            f"{name!r} (written with "
                            "force_required=True)")
                    body += _avro_encode(v, ftype)
            body = bytes(body)
            if codec == "deflate":
                import zlib as _zlib
                co = _zlib.compressobj(6, _zlib.DEFLATED, -15)
                body = co.compress(body) + co.flush()
            out += _zigzag(n) + _zigzag(len(body)) + body + sync
            n_total += n
        if not n_total:
            yield pd.DataFrame({"path": [], "rows": []})
            return
        fname = os.path.join(path, f"part-{_uuid.uuid4().hex}.avro")
        with open(fname, "wb") as fh:
            fh.write(bytes(out))
        yield pd.DataFrame({"path": [fname], "rows": [n_total]})

    summary = df.mapInPandas(encode, "path string, rows long").collect()
    return sorted(r["path"] for r in summary)
