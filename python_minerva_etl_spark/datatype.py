"""Type-deduction lattice — dynamic schema typing from strings.

Reference semantics (minerva/storage/datatype.py [U]): on ingest,
counter values arrive as strings; deduction picks the *smallest* type
matching every observed string, and generalization of two types takes
their lattice max (smallint -> integer -> bigint -> real -> double ->
numeric -> text; boolean and timestamp join into text).  Loading data
whose deduced type is wider than the stored column widens the column
(ALTER TABLE in the reference; an explicit cast pass over parquet here,
OP-TYPE-WIDEN).
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Lattice order: index = rank; generalize = max rank along a chain.
_NUMERIC_CHAIN = ["smallint", "integer", "bigint", "double", "text"]
_RANK = {t: i for i, t in enumerate(_NUMERIC_CHAIN)}

_BOOL = re.compile(r"^(true|false|t|f|0|1)$", re.IGNORECASE)
_INT = re.compile(r"^[+-]?\d+$")
_FLOAT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_TS_FORMATS = (
    "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M", "%Y-%m-%d",
)

SMALLINT_MAX = 2 ** 15 - 1
INT_MAX = 2 ** 31 - 1
BIGINT_MAX = 2 ** 63 - 1

SPARK_TYPES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "smallint": T.ShortType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "text": T.StringType(),
}


def deduce_from_string(value: str | None) -> str:
    """Smallest Minerva type whose domain contains ``value``."""
    if value is None or value == "":
        return "smallint"  # bottom — nulls do not constrain the type
    v = value.strip()
    if _INT.match(v):
        try:
            n = abs(int(v))
        except ValueError:
            return "text"
        if n <= SMALLINT_MAX:
            return "smallint"
        if n <= INT_MAX:
            return "integer"
        if n <= BIGINT_MAX:
            return "bigint"
        return "double"
    if _FLOAT.match(v):
        return "double"
    if _BOOL.match(v):
        return "boolean"
    for fmt in _TS_FORMATS:
        try:
            datetime.strptime(v, fmt)
            return "timestamp"
        except ValueError:
            continue
    return "text"


def generalize(a: str, b: str) -> str:
    """Lattice max of two deduced types."""
    if a == b:
        return a
    # boolean/timestamp only generalize with themselves (else text),
    # except boolean 0/1 strings which deduce as smallint anyway.
    special = {"boolean", "timestamp"}
    if a in special or b in special:
        return "text"
    ra, rb = _RANK.get(a), _RANK.get(b)
    if ra is None or rb is None:
        return "text"
    return _NUMERIC_CHAIN[max(ra, rb)]


def deduce_many(values) -> str:
    out = "smallint"
    for v in values:
        out = generalize(out, deduce_from_string(v))
        if out == "text":
            break
    return out


def deduce_column_types(df: DataFrame, columns: list[str],
                        sample_rows: int = 1000) -> dict[str, str]:
    """OP-TYPE-DEDUCE over a string-typed DataFrame: deduce the lattice
    type of each column from a bounded sample (the reference deduces
    from every value during parse; a bounded sample keeps the driver
    O(1) — a wrong-too-narrow guess is corrected later by the widening
    path, exactly like the reference's ALTER-on-error retry)."""
    sample = df.select(*columns).limit(sample_rows).collect()
    out: dict[str, str] = {}
    for c in columns:
        out[c] = deduce_many([None if row[c] is None else str(row[c])
                              for row in sample])
    return out


def widen_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """OP-TYPE-WIDEN: cast/extend ``df`` to the target schema.

    Missing columns are added as typed NULLs; present columns are cast.
    The Spark analog of the reference's ALTER-TABLE-on-error retry loop
    (trendstorepart.py [U]) — but done declaratively up front, once per
    batch, instead of reactively per failure.
    """
    cols = []
    have = {f.name for f in df.schema.fields}
    for field in target.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def generalize_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Union of two schemas with lattice-widened conflicting types."""
    _to_name = {
        T.ShortType(): "smallint", T.IntegerType(): "integer",
        T.LongType(): "bigint", T.FloatType(): "double",
        T.DoubleType(): "double", T.BooleanType(): "boolean",
        T.TimestampType(): "timestamp", T.StringType(): "text",
    }
    fields: dict[str, T.DataType] = {f.name: f.dataType for f in a.fields}
    for f in b.fields:
        if f.name not in fields:
            fields[f.name] = f.dataType
        elif fields[f.name] != f.dataType:
            na = _to_name.get(fields[f.name], "text")
            nb = _to_name.get(f.dataType, "text")
            fields[f.name] = SPARK_TYPES[generalize(na, nb)]
    return T.StructType([T.StructField(k, v, True) for k, v in fields.items()])


def schema_diff(old: T.StructType, new: T.StructType) -> list[dict]:
    """Schema-drift report between two schema versions: what a loader
    did to the store (the reference logs this as ALTER TABLE events;
    a lake table records it across snapshot versions).

    Returns one dict per changed column:
    ``{"column", "change": added|removed|widened|narrowed|changed,
    "from", "to"}`` — ``widened`` when the new type is reachable by
    the deduction lattice (safe, what add-unknown-trends loading
    does), ``narrowed``/``changed`` when it is not (requires operator
    intervention, exactly like the reference's manual migrations).
    """
    _to_name = {
        T.ShortType(): "smallint", T.IntegerType(): "integer",
        T.LongType(): "bigint", T.FloatType(): "double",
        T.DoubleType(): "double", T.BooleanType(): "boolean",
        T.TimestampType(): "timestamp", T.StringType(): "text",
    }
    o = {f.name: f.dataType for f in old.fields}
    n = {f.name: f.dataType for f in new.fields}
    report: list[dict] = []
    for name in o:
        if name not in n:
            report.append({"column": name, "change": "removed",
                           "from": o[name].simpleString(), "to": None})
        elif o[name] != n[name]:
            na, nb = _to_name.get(o[name], "text"), _to_name.get(
                n[name], "text")
            if generalize(na, nb) == nb:
                change = "widened"
            elif generalize(na, nb) == na:
                change = "narrowed"
            else:
                change = "changed"
            report.append({"column": name, "change": change,
                           "from": o[name].simpleString(),
                           "to": n[name].simpleString()})
    for name in n:
        if name not in o:
            report.append({"column": name, "change": "added",
                           "from": None, "to": n[name].simpleString()})
    return report
