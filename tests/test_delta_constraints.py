"""Delta CHECK constraints + column invariants + NOT NULL
enforcement (PROTOCOL.md "CHECK Constraints" / "Column Invariants"):
a writer that claims the checkConstraints/invariants features and
skips enforcement corrupts the table's contract for every other
engine, so every path that lands NEW rows validates first — append,
overwrite, UPDATE, MERGE, replaceWhere — and legacy
minWriterVersion-3 tables (which imply check constraints) are now
writable WITH enforcement instead of refused."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_minerva_etl_spark.storage.delta import DeltaTable


def _constrained(spark, p):
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame(
        [(1, 10.0), (2, 5.0)], "id long, val double"))
    dt.add_constraint(spark, "positive_val", "val > 0")
    return dt


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    dt = _constrained(spark, str(tmp_path / "t"))
    # the protocol carries the writer feature
    proto = dt._replay()["protocol"]
    assert "checkConstraints" in (proto.get("writerFeatures") or [])
    with pytest.raises(ValueError, match="existing rows violate"):
        dt.add_constraint(spark, "big", "val > 100")
    # idempotent re-add commits nothing
    v = dt._replay()["version"]
    assert dt.add_constraint(spark, "positive_val", "val > 0") == v
    # set_properties refuses the side door
    with pytest.raises(ValueError, match="add_constraint"):
        dt.set_properties({"delta.constraints.sneaky": "val > 0"})


def test_every_write_path_enforces(spark, tmp_path):
    dt = _constrained(spark, str(tmp_path / "t"))
    bad = spark.createDataFrame([(9, -1.0)], "id long, val double")
    with pytest.raises(ValueError, match="positive_val"):
        dt.write(spark, bad)
    with pytest.raises(ValueError, match="positive_val"):
        dt.write(spark, bad, mode="overwrite")
    with pytest.raises(ValueError, match="positive_val"):
        dt.update(spark, {"val": "val - 100"})
    with pytest.raises(ValueError, match="positive_val"):
        dt.merge(spark, bad, "t.id = s.id",
                 when_not_matched_insert=True)
    with pytest.raises(ValueError, match="positive_val"):
        dt.replace_where(spark, bad, "id = 9")
    # a NULL check result is a violation (delta-spark semantics)
    with pytest.raises(ValueError, match="positive_val"):
        dt.write(spark, spark.createDataFrame(
            [(9, None)], "id long, val double"))
    # nothing above committed anything
    assert dt.read(spark).count() == 2
    # DELETE has no new rows: still fine on a constrained table
    assert dt.delete(spark, "id = 2") is not None
    # drop -> the violating append lands
    dt.drop_constraint("positive_val")
    assert dt.drop_constraint("positive_val") is None  # idempotent
    dt.write(spark, bad)
    assert dt.read(spark).count() == 2


def test_legacy_mwv3_table_writable_and_enforced(spark, tmp_path):
    """A foreign minWriterVersion-3 table (legacy check-constraints
    version) was refused before round 6; now it writes WITH
    enforcement."""
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame([(1,)], "id long"))
    cpath = glob.glob(os.path.join(p, "_delta_log", "*0.json"))[0]
    lines = [json.loads(ln) for ln in open(cpath)]
    for ln in lines:
        if ln.get("protocol"):
            ln["protocol"]["minWriterVersion"] = 3
        if ln.get("metaData"):
            ln["metaData"]["configuration"] = {
                "delta.constraints.pos": "id > 0"}
    open(cpath, "w").write(
        "\n".join(json.dumps(ln) for ln in lines) + "\n")
    with pytest.raises(ValueError, match="CHECK constraint 'pos'"):
        dt.write(spark, spark.createDataFrame([(-5,)], "id long"))
    dt.write(spark, spark.createDataFrame([(7,)], "id long"))
    assert sorted(r.id for r in dt.read(spark).collect()) == [1, 7]
    # v6 still refuses (identity-column high-water-mark state)
    for ln in lines:
        if ln.get("protocol"):
            ln["protocol"]["minWriterVersion"] = 6
    open(cpath, "w").write(
        "\n".join(json.dumps(ln) for ln in lines) + "\n")
    with pytest.raises(NotImplementedError, match="not supported"):
        dt.write(spark, spark.createDataFrame([(8,)], "id long"))


def test_column_invariants_and_not_null(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    sch = T.StructType([
        T.StructField("x", T.LongType(), False),
        T.StructField("y", T.LongType(), True, metadata={
            "delta.invariants": json.dumps(
                {"expression": {"expression": "y < 100"}})}),
    ])
    dt.write(spark, spark.createDataFrame([(1, 5)], sch))
    with pytest.raises(ValueError, match="column invariant on 'y'"):
        dt.write(spark, spark.createDataFrame([(2, 500)], sch))
    nullable = T.StructType([
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.LongType(), True,
                      metadata=sch["y"].metadata)])
    with pytest.raises(ValueError, match="NOT NULL column 'x'"):
        dt.write(spark, spark.createDataFrame([(None, 5)], nullable))
    assert dt.read(spark).count() == 1


def test_generated_columns_validated_and_mwv4_writable(spark,
                                                       tmp_path):
    """Generated columns take the protocol's validate-don't-compute
    branch: provided values must EQUAL the generation expression;
    legacy minWriterVersion-4 tables (CDF + generated columns) are
    now writable with full enforcement, v5 still refuses."""
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    sch = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("id2", T.LongType(), True, metadata={
            "delta.generationExpression": "id * 2"}),
    ])
    dt.write(spark, spark.createDataFrame([(1, 2)], sch))
    with pytest.raises(ValueError, match="generated column 'id2'"):
        dt.write(spark, spark.createDataFrame([(2, 5)], sch))
    dt.write(spark, spark.createDataFrame([(3, 6)], sch))
    assert dt.read(spark).count() == 2
    # a mwv-4 foreign table with CDF enabled: writable, DML carries
    # cdc, generated column still enforced
    cpath = glob.glob(os.path.join(p, "_delta_log", "*0.json"))[0]
    lines = [json.loads(ln) for ln in open(cpath)]
    for ln in lines:
        if ln.get("protocol"):
            ln["protocol"]["minWriterVersion"] = 4
        if ln.get("metaData"):
            ln["metaData"]["configuration"] = {
                "delta.enableChangeDataFeed": "true"}
    open(cpath, "w").write(
        "\n".join(json.dumps(ln) for ln in lines) + "\n")
    with pytest.raises(ValueError, match="generated column"):
        dt.write(spark, spark.createDataFrame([(4, 9)], sch))
    v = dt.update(spark, {"id": "id + 0"}, "id = 1")
    kinds = {r._change_type
             for r in dt.changes(spark, v, v).collect()}
    assert kinds == {"update_preimage", "update_postimage"}
    # v6 refusal on a fresh table (the update above upgraded this
    # one's protocol to table features, superseding version 0)
    p2 = str(tmp_path / "t2")
    dt2 = DeltaTable(p2)
    dt2.write(spark, spark.createDataFrame([(1,)], "id long"))
    c2 = glob.glob(os.path.join(p2, "_delta_log", "*0.json"))[0]
    lines2 = [json.loads(ln) for ln in open(c2)]
    for ln in lines2:
        if ln.get("protocol"):
            ln["protocol"]["minWriterVersion"] = 6
    open(c2, "w").write(
        "\n".join(json.dumps(ln) for ln in lines2) + "\n")
    with pytest.raises(NotImplementedError, match="identity"):
        dt2.write(spark, spark.createDataFrame([(5,)], "id long"))
