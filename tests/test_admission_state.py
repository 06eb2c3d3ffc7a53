"""Checkpoint-scoped persisted admission watermark
(``option("admissionStateDir", dir)``): a RESTARTED rate-limited
stream caps its very first micro-batch instead of planning the whole
piled-up backlog as one uncapped batch — on all three registered
sources — with exactly-once intact and misuse refused loudly."""

from __future__ import annotations

import json
import os

import pytest

from python_minerva_etl_spark.storage.iceberg import IcebergTable
from python_minerva_etl_spark.storage.iceberg_write import write_iceberg
from python_minerva_etl_spark.streaming.avro_source import (
    register_avro_source)
from tests.test_avro_source import _write


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def av_spark(spark):
    register_avro_source(spark)
    return spark


def test_avro_restart_first_offset_capped(av_spark, tmp_path):
    """The r9 hole, closed: a NEW reader (process restart) with the
    same admissionStateDir caps its FIRST latestOffset relative to
    where the previous run left off."""
    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamReader)

    p = str(tmp_path / "av")
    sd = str(tmp_path / "state")
    for i in range(3):
        _write(av_spark, p, i * 10, (i + 1) * 10,
               name=f"part-{i:03d}.avro")

    r = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "2",
                           "admissionStateDir": sd})
    # run 1: blind first call (no state yet) is uncapped, persists
    assert r.latestOffset()["hw"] == "part-002.avro"

    # the process dies; a 6-file backlog piles up
    for i in range(3, 9):
        _write(av_spark, p, i * 10, (i + 1) * 10,
               name=f"part-{i:03d}.avro")

    # run 2 (new reader instance): first offset already capped
    r2 = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "2",
                            "admissionStateDir": sd})
    assert r2.latestOffset() == {"n": 5, "hw": "part-004.avro"}
    assert r2.latestOffset() == {"n": 7, "hw": "part-006.avro"}
    assert r2.latestOffset() == {"n": 9, "hw": "part-008.avro"}
    assert r2.latestOffset() == {"n": 9, "hw": "part-008.avro"}

    # run 3: the last persisted offset carries over too
    r3 = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "2",
                            "admissionStateDir": sd})
    _write(av_spark, p, 90, 100, name="part-009.avro")
    assert r3.latestOffset() == {"n": 10, "hw": "part-009.avro"}


def test_avro_bytes_cap_and_commit_persist(av_spark, tmp_path):
    """maxBytesPerTrigger qualifies for the state dir too, and
    commit() refreshes the file."""
    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamReader)

    p = str(tmp_path / "av")
    sd = str(tmp_path / "state")
    _write(av_spark, p, 0, 10, name="part-000.avro")
    r = _AvroStreamReader({"path": p, "maxBytesPerTrigger": "1",
                           "admissionStateDir": sd})
    o = r.latestOffset()
    r.commit(o)
    with open(os.path.join(sd, "admission-watermark.json")) as fh:
        assert json.load(fh)["watermark"] == "part-000.avro"
    _write(av_spark, p, 10, 20, name="part-001.avro")
    _write(av_spark, p, 20, 30, name="part-002.avro")
    r2 = _AvroStreamReader({"path": p, "maxBytesPerTrigger": "1",
                            "admissionStateDir": sd})
    # 1-byte budget: one file per trigger, from the first offset on
    assert r2.latestOffset()["hw"] == "part-001.avro"
    assert r2.latestOffset()["hw"] == "part-002.avro"


def test_state_dir_misuse_refused(av_spark, tmp_path):
    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamReader)

    p = str(tmp_path / "av")
    p2 = str(tmp_path / "av2")
    sd = str(tmp_path / "state")
    _write(av_spark, p, 0, 10, name="part-000.avro")
    _write(av_spark, p2, 0, 10, name="part-000.avro")

    # a state dir with no rate limit has nothing to persist
    with pytest.raises(ValueError, match="admissionStateDir"):
        _AvroStreamReader({"path": p, "admissionStateDir": sd})

    r = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "1",
                           "admissionStateDir": sd})
    r.latestOffset()
    # same dir, different source path: refuse, don't cross-cap
    with pytest.raises(ValueError, match="state dir"):
        _AvroStreamReader({"path": p2, "maxFilesPerTrigger": "1",
                           "admissionStateDir": sd})
    # same dir, different source type: refuse
    from python_minerva_etl_spark.streaming.admission import (
        PersistedWatermark)
    with pytest.raises(ValueError, match="state dir"):
        PersistedWatermark(sd, "minerva_delta", p).load()


def test_delta_restart_first_offset_capped(spark, tmp_path):
    from python_minerva_etl_spark.storage.delta import DeltaTable
    from python_minerva_etl_spark.streaming.delta_source import (
        _StreamReader, register_delta_source)

    register_delta_source(spark)
    p = str(tmp_path / "t")
    sd = str(tmp_path / "state")
    dt = DeltaTable(p)
    dt.write(spark, spark.range(4).toDF("id").coalesce(1))  # v0

    r = _StreamReader({"path": p, "maxFilesPerTrigger": "1",
                       "admissionStateDir": sd})
    assert r.latestOffset() == {"version": 0}

    # backlog: four single-file commits land while the query is down
    for i in range(1, 5):
        dt.write(spark, spark.range(i * 10, i * 10 + 2)
                 .toDF("id").coalesce(1))

    r2 = _StreamReader({"path": p, "maxFilesPerTrigger": "1",
                        "admissionStateDir": sd})
    # first offset of the restart: capped at one commit past v0
    assert r2.latestOffset() == {"version": 1}
    assert r2.latestOffset() == {"version": 2}
    assert r2.latestOffset() == {"version": 3}
    assert r2.latestOffset() == {"version": 4}
    assert r2.latestOffset() == {"version": 4}


def test_iceberg_restart_first_offset_capped(spark, tmp_path):
    from python_minerva_etl_spark.streaming.iceberg_source import (
        _IceStreamReader, register_iceberg_source)

    register_iceberg_source(spark)
    p = str(tmp_path / "t")
    sd = str(tmp_path / "state")
    write_iceberg(spark, spark.range(4).toDF("id").coalesce(1), p)
    ids = [IcebergTable(p).metadata()["current-snapshot-id"]]

    r = _IceStreamReader(
        {"path": p, "streaming-max-files-per-micro-batch": "1",
         "admissionStateDir": sd})
    assert r.latestOffset() == {"snapshot": ids[0]}

    for i in range(1, 4):
        write_iceberg(spark, spark.range(i * 10, i * 10 + 2)
                      .toDF("id").coalesce(1), p)
        ids.append(IcebergTable(p).metadata()["current-snapshot-id"])

    r2 = _IceStreamReader(
        {"path": p, "streaming-max-files-per-micro-batch": "1",
         "admissionStateDir": sd})
    # first offset of the restart: one snapshot past the watermark
    assert r2.latestOffset() == {"snapshot": ids[1]}
    assert r2.latestOffset() == {"snapshot": ids[2]}
    assert r2.latestOffset() == {"snapshot": ids[3]}
    assert r2.latestOffset() == {"snapshot": ids[3]}
    # commit of a REPLAYED (older) end must not regress the file
    r2.commit({"snapshot": ids[1]})
    r3 = _IceStreamReader(
        {"path": p, "streaming-max-files-per-micro-batch": "1",
         "admissionStateDir": sd})
    write_iceberg(spark, spark.range(90, 92).toDF("id")
                  .coalesce(1), p)
    ids.append(IcebergTable(p).metadata()["current-snapshot-id"])
    assert r3.latestOffset() == {"snapshot": ids[4]}


def test_avro_live_restart_every_batch_capped(av_spark, tmp_path):
    """The verdict's e2e: a checkpointed live query stops, a big
    backlog piles up, the RESTARTED query drains it one file per
    micro-batch (including micro-batch zero of the restart) and
    every row still arrives exactly once."""
    import time
    import uuid as _uuid

    p = str(tmp_path / "av")
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    sd = str(tmp_path / "state")

    def drop(lo, hi, name):
        src = _write(av_spark, stage, lo, hi, name=name)
        os.makedirs(p, exist_ok=True)
        os.rename(src, os.path.join(p, name))

    def start():
        return (av_spark.readStream.format("minerva_avro")
                .option("maxFilesPerTrigger", "1")
                .option("admissionStateDir", sd).load(p)
                .writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(processingTime="250 milliseconds").start())

    def out_count():
        try:
            return av_spark.read.parquet(out).count()
        except Exception:  # sink dir not created / no files yet
            return 0

    drop(0, 10, "part-000.avro")
    drop(10, 20, "part-001.avro")
    q = start()
    try:
        deadline = time.time() + 120
        while out_count() < 20:
            assert time.time() < deadline
            time.sleep(0.25)
    finally:
        q.stop()

    # the query is down; a 5-file backlog piles up
    for i in range(2, 7):
        drop(i * 10, (i + 1) * 10, f"part-{i:03d}.avro")

    q = start()
    try:
        deadline = time.time() + 120
        while out_count() < 70:
            assert time.time() < deadline
            time.sleep(0.25)
        # exactly once, all 70 rows
        got = _rows(av_spark.read.parquet(out).select("id"))
        assert got == [(i,) for i in range(70)]
        # EVERY non-empty batch of the restarted run — including its
        # first — took at most one file (10 rows)
        sizes = [int(pr["numInputRows"]) for pr in q.recentProgress
                 if int(pr["numInputRows"]) > 0]
        assert sizes and max(sizes) <= 10 and len(sizes) >= 5
    finally:
        q.stop()


def test_assume_fresh_start_caps_cold_backlog(av_spark, tmp_path):
    """assumeFreshStart + admissionStateDir: a BRAND-NEW query's very
    first latestOffset caps over a pre-existing backlog; a restart
    (state file present) ignores the assertion and resumes from the
    persisted watermark — never regressing."""
    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamReader)

    p = str(tmp_path / "av")
    sd = str(tmp_path / "state")
    for i in range(6):
        _write(av_spark, p, i * 10, (i + 1) * 10,
               name=f"part-{i:03d}.avro")

    r = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "2",
                           "admissionStateDir": sd,
                           "assumeFreshStart": "true"})
    # cold 6-file backlog drains capped from the FIRST offset
    assert r.latestOffset() == {"n": 2, "hw": "part-001.avro"}
    assert r.latestOffset() == {"n": 4, "hw": "part-003.avro"}

    # restart with the assertion still set: the state file wins —
    # the watermark resumes at part-003, no epoch regression
    r2 = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "2",
                            "admissionStateDir": sd,
                            "assumeFreshStart": "true"})
    assert r2.latestOffset() == {"n": 6, "hw": "part-005.avro"}

    # the assertion without a state dir is refused loudly
    import pytest
    with pytest.raises(ValueError, match="assumeFreshStart"):
        _AvroStreamReader({"path": p, "maxFilesPerTrigger": "2",
                           "assumeFreshStart": "true"})


def test_assume_fresh_start_delta_and_iceberg(spark, tmp_path):
    from python_minerva_etl_spark.storage.delta import DeltaTable
    from python_minerva_etl_spark.storage.iceberg import IcebergTable
    from python_minerva_etl_spark.storage.iceberg_write import (
        write_iceberg)
    from python_minerva_etl_spark.streaming.delta_source import (
        _StreamReader)
    from python_minerva_etl_spark.streaming.iceberg_source import (
        _IceStreamReader)

    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    for i in range(3):
        dt.write(spark, spark.range(i * 10, i * 10 + 2)
                 .toDF("id").coalesce(1))
    r = _StreamReader({"path": p, "maxFilesPerTrigger": "1",
                       "admissionStateDir": str(tmp_path / "sd"),
                       "assumeFreshStart": "true"})
    # cold history drains one commit per trigger from offset ONE
    assert r.latestOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 1}
    assert r.latestOffset() == {"version": 2}

    p2 = str(tmp_path / "ice")
    ids = []
    for i in range(3):
        write_iceberg(spark, spark.range(i * 10, i * 10 + 2)
                      .toDF("id").coalesce(1), p2)
        ids.append(IcebergTable(p2).metadata()["current-snapshot-id"])
    r2 = _IceStreamReader(
        {"path": p2, "streaming-max-files-per-micro-batch": "1",
         "admissionStateDir": str(tmp_path / "sd2"),
         "assumeFreshStart": "true"})
    assert r2.latestOffset() == {"snapshot": ids[0]}
    assert r2.latestOffset() == {"snapshot": ids[1]}
    assert r2.latestOffset() == {"snapshot": ids[2]}


def test_delta_live_restart_every_batch_capped(spark, tmp_path):
    """Delta twin of the avro live-restart e2e: a checkpointed query
    stops, a 4-commit backlog lands, the restarted query drains one
    commit per micro-batch (including batch zero) with exactly-once
    output."""
    import time

    from python_minerva_etl_spark.storage.delta import DeltaTable
    from python_minerva_etl_spark.streaming.delta_source import (
        register_delta_source)

    register_delta_source(spark)
    p = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    sd = str(tmp_path / "state")
    dt = DeltaTable(p)

    def start():
        return (spark.readStream.format("minerva_delta")
                .option("maxFilesPerTrigger", "1")
                .option("admissionStateDir", sd).load(p)
                .writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(processingTime="250 milliseconds").start())

    def out_count():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    dt.write(spark, spark.range(10).toDF("id").coalesce(1))
    q = start()
    try:
        deadline = time.time() + 120
        while out_count() < 10:
            assert time.time() < deadline
            time.sleep(0.25)
    finally:
        q.stop()

    # the query is down; 4 single-file commits land
    for i in range(1, 5):
        dt.write(spark, spark.range(i * 10, (i + 1) * 10)
                 .toDF("id").coalesce(1))

    q = start()
    try:
        deadline = time.time() + 120
        while out_count() < 50:
            assert time.time() < deadline
            time.sleep(0.25)
        got = _rows(spark.read.parquet(out).select("id"))
        assert got == [(i,) for i in range(50)]
        sizes = [int(pr["numInputRows"]) for pr in q.recentProgress
                 if int(pr["numInputRows"]) > 0]
        # EVERY batch of the restarted run took at most one commit
        assert sizes and max(sizes) <= 10 and len(sizes) >= 4
    finally:
        q.stop()


def test_iceberg_live_restart_every_batch_capped(spark, tmp_path):
    """Iceberg twin: the restarted query drains a 4-snapshot backlog
    one snapshot per micro-batch, exactly once."""
    import time

    from python_minerva_etl_spark.streaming.iceberg_source import (
        register_iceberg_source)

    register_iceberg_source(spark)
    p = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    sd = str(tmp_path / "state")

    def start():
        return (spark.readStream.format("minerva_iceberg")
                .option("streaming-max-files-per-micro-batch", "1")
                .option("admissionStateDir", sd).load(p)
                .writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(processingTime="250 milliseconds").start())

    def out_count():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    write_iceberg(spark, spark.range(10).toDF("id").coalesce(1), p)
    q = start()
    try:
        deadline = time.time() + 120
        while out_count() < 10:
            assert time.time() < deadline
            time.sleep(0.25)
    finally:
        q.stop()

    for i in range(1, 5):
        write_iceberg(spark, spark.range(i * 10, (i + 1) * 10)
                      .toDF("id").coalesce(1), p)

    q = start()
    try:
        deadline = time.time() + 120
        while out_count() < 50:
            assert time.time() < deadline
            time.sleep(0.25)
        got = _rows(spark.read.parquet(out).select("id"))
        assert got == [(i,) for i in range(50)]
        sizes = [int(pr["numInputRows"]) for pr in q.recentProgress
                 if int(pr["numInputRows"]) > 0]
        assert sizes and max(sizes) <= 10 and len(sizes) >= 4
    finally:
        q.stop()
