"""Delta RESTORE (version rollback as a forward commit) and
merge_schema append evolution (new nullable columns; old files read
them as null)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from python_minerva_etl_spark.storage.delta import (DeltaTable,
                                                    restore_delta,
                                                    write_delta)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------ merge_schema append

def test_merge_schema_adds_nullable_column(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame(
        [(1, "a")], "id long, v string"))
    dt.write(spark, spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"),
        merge_schema=True)
    out = dt.read(spark)
    assert [f.name for f in out.schema.fields] == ["id", "v",
                                                   "score"]
    assert out.schema["score"].nullable
    assert _rows(out) == [(1, "a", None), (2, "b", 9.5)]


def test_merge_schema_missing_nullable_column_reads_null(spark,
                                                         tmp_path):
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame(
        [(1, "a")], "id long, v string"))
    dt.write(spark, spark.createDataFrame([(2,)], "id long"),
             merge_schema=True)
    assert _rows(dt.read(spark)) == [(1, "a"), (2, None)]


def test_merge_schema_refuses_type_change(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="type mismatch"):
        dt.write(spark, spark.createDataFrame([(2.0,)], "id double"),
                 merge_schema=True)


def test_merge_schema_refuses_missing_required_column(spark,
                                                      tmp_path):
    import pyspark.sql.types as T
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True)])
    dt.write(spark, spark.createDataFrame([(1, "a")], schema))
    with pytest.raises(ValueError, match="non-nullable"):
        dt.write(spark,
                 spark.createDataFrame([("x",)], "v string"),
                 merge_schema=True)


def test_plain_append_error_mentions_merge_schema(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="merge_schema=True"):
        dt.write(spark, spark.createDataFrame(
            [(2, "b")], "id long, v string"))


# ------------------------------------------------------------ RESTORE

def _three_versions(spark, p):
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(4)], "id long, value double"))
    dt.write(spark, spark.createDataFrame(
        [(10, 10.0)], "id long, value double"))
    dt.delete(spark, "id = 1")
    return dt


def test_restore_to_first_version(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = _three_versions(spark, p)
    v = dt.restore(spark, 0)
    assert v == 3  # forward commit, history preserved
    assert dt.versions() == [0, 1, 2, 3]
    assert _rows(dt.read(spark)) == [(i, float(i)) for i in range(4)]


def test_restore_reapplies_deletion_vectors(spark, tmp_path):
    # restoring a post-delete version from a later state must bring
    # the DV-carrying add back
    p = str(tmp_path / "t")
    dt = _three_versions(spark, p)  # v2 = delete id=1
    dt.write(spark, spark.createDataFrame(
        [(20, 20.0)], "id long, value double"))  # v3
    dt.restore(spark, 2)
    got = _rows(dt.read(spark))
    assert (1, 1.0) not in got and (20, 20.0) not in got
    assert (10, 10.0) in got and len(got) == 4


def test_restore_noop_returns_current_without_commit(spark,
                                                     tmp_path):
    p = str(tmp_path / "t")
    dt = _three_versions(spark, p)
    assert dt.restore(spark, 2) == 2
    assert dt.versions() == [0, 1, 2]


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.range(3).toDF("id"))
    dt.write(spark, spark.range(3, 6).toDF("id"), mode="overwrite")
    dt.vacuum(retention_hours=0, allow_short_retention=True,
              now_ms=int(__import__("time").time() * 1000) + 10 ** 9)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        dt.restore(spark, 0)
    assert dt.versions() == [0, 1]  # nothing committed


def test_restore_reverts_schema_evolution(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame([(1,)], "id long"))
    dt.write(spark, spark.createDataFrame(
        [(2, "b")], "id long, v string"), merge_schema=True)
    dt.restore(spark, 0)
    out = dt.read(spark)
    assert [f.name for f in out.schema.fields] == ["id"]
    assert _rows(out) == [(1,)]


def test_restore_refused_on_append_only(spark, tmp_path):
    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.range(2).toDF("id"))
    dt.write(spark, spark.range(2, 4).toDF("id"))
    dt.set_properties({"delta.appendOnly": "true"})
    with pytest.raises(ValueError, match="append-only"):
        restore_delta(spark, p, 0)


def test_restore_then_time_travel_still_sees_history(spark,
                                                     tmp_path):
    p = str(tmp_path / "t")
    dt = _three_versions(spark, p)
    dt.restore(spark, 0)
    # the pre-restore state is still readable by version
    assert (10, 10.0) in _rows(dt.read(spark, 2))
    assert (1, 1.0) not in _rows(dt.read(spark, 2))


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """timestamp_as_of resolves to the LATEST commit at or before
    the target (commitInfo.timestamp first, file mtime fallback,
    running-max adjustment), refuses pre-history targets, and takes
    datetime / ISO-string / epoch-ms inputs."""
    import datetime
    import time

    from python_minerva_etl_spark.storage.delta import read_delta

    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame([(1,)], "id long"))
    t0 = time.time() * 1000
    time.sleep(0.05)
    dt.write(spark, spark.createDataFrame([(2,)], "id long"))
    time.sleep(0.05)
    t1 = time.time() * 1000
    dt.write(spark, spark.createDataFrame([(3,)], "id long"))

    assert dt.version_at(t0) == 0
    assert dt.version_at(t1) == 1
    iso = datetime.datetime.fromtimestamp(
        t1 / 1000, datetime.timezone.utc).isoformat()
    assert dt.version_at(iso) == 1
    got = sorted(r.id for r in read_delta(
        spark, p, timestamp_as_of=t1).collect())
    assert got == [1, 2]
    got = sorted(r.id for r in read_delta(
        spark, p, timestamp_as_of=time.time() * 1000).collect())
    assert got == [1, 2, 3]
    with pytest.raises(ValueError, match="before the earliest"):
        dt.version_at(1000)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, p, version_as_of=1, timestamp_as_of=t1)
    with pytest.raises(TypeError, match="epoch ms"):
        dt.version_at([t1])
