"""Type-deduction lattice — mirrors the reference's
tests/test_datatype.py [U]."""

from __future__ import annotations

from python_minerva_etl_spark.datatype import (deduce_from_string,
                                               deduce_many, generalize)


def test_deduce_ints_by_magnitude():
    assert deduce_from_string("42") == "smallint"
    assert deduce_from_string("40000") == "integer"
    assert deduce_from_string("3000000000") == "bigint"
    assert deduce_from_string(str(2 ** 70)) == "double"


def test_deduce_floats_bools_ts_text():
    assert deduce_from_string("3.14") == "double"
    assert deduce_from_string("1e10") == "double"
    assert deduce_from_string("true") == "boolean"
    assert deduce_from_string("2024-01-01 10:00:00") == "timestamp"
    assert deduce_from_string("2024-01-01") == "timestamp"
    assert deduce_from_string("hello") == "text"
    assert deduce_from_string("") == "smallint"  # null doesn't constrain
    assert deduce_from_string(None) == "smallint"


def test_generalize_chain():
    assert generalize("smallint", "integer") == "integer"
    assert generalize("integer", "double") == "double"
    assert generalize("smallint", "text") == "text"
    assert generalize("boolean", "integer") == "text"
    assert generalize("timestamp", "timestamp") == "timestamp"
    assert generalize("timestamp", "double") == "text"


def test_deduce_many_takes_lattice_max():
    assert deduce_many(["1", "2", "70000"]) == "integer"
    assert deduce_many(["1", "2.5"]) == "double"
    assert deduce_many(["1", "x"]) == "text"


def test_widen_to_adds_and_casts(spark):
    from pyspark.sql import types as T

    from python_minerva_etl_spark.datatype import widen_to

    df = spark.createDataFrame([(1, "2")], "a int, b string")
    target = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("c", T.StringType()),
    ])
    out = widen_to(df, target)
    assert [f.dataType.simpleString() for f in out.schema.fields] == \
        ["bigint", "double", "string"]
    row = out.collect()[0]
    assert row.a == 1 and row.b == 2.0 and row.c is None


def test_schema_diff_classifies_drift():
    from pyspark.sql import types as T

    from python_minerva_etl_spark.datatype import schema_diff

    old = T.StructType([
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("gone", T.StringType()),
        T.StructField("t", T.TimestampType()),
    ])
    new = T.StructType([
        T.StructField("a", T.LongType()),      # widened (int -> bigint)
        T.StructField("b", T.IntegerType()),   # narrowed
        T.StructField("t", T.StringType()),    # widened to text (lattice top)
        T.StructField("fresh", T.BooleanType()),
    ])
    rep = {r["column"]: r for r in schema_diff(old, new)}
    assert rep["a"]["change"] == "widened"
    assert rep["b"]["change"] == "narrowed"
    assert rep["gone"]["change"] == "removed"
    assert rep["t"]["change"] == "widened"
    assert rep["fresh"]["change"] == "added" and rep["fresh"]["from"] is None
    assert "c" not in rep
