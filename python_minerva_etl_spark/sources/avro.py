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

    def decode(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                with open(p, "rb") as fh:
                    m, recs = avro_read(fh.read())
                if _json.dumps(_json.loads(
                        m["avro.schema"].decode("utf-8")),
                        sort_keys=True) != canon:
                    raise ValueError(
                        f"avro: {os.path.basename(p)!r} writer schema "
                        "differs from the directory's first file — "
                        "mixed-schema reads are refused")
                for r in recs:
                    rows.append(tuple(
                        _convert(r.get(f["name"]), f["type"])
                        for f in writer_schema["fields"]))
            yield pd.DataFrame(
                rows, columns=[f["name"]
                               for f in writer_schema["fields"]])

    fdf = (spark.createDataFrame([(p,) for p in files], "path string")
           .repartition(len(files)))
    return fdf.mapInPandas(decode, spark_schema)
