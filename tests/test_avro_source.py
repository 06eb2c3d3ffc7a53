"""The registered `minerva_avro` Python data source: batch parity
with read_avro over byte-range splits, logical-type schema
derivation, and the streaming source tailing a growing directory
with sorted-name offsets (checkpointed continuation; out-of-order
arrivals fail loudly)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_minerva_etl_spark.sources.avro import read_avro, write_avro
from python_minerva_etl_spark.streaming.avro_source import (
    register_avro_source)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def av_spark(spark):
    register_avro_source(spark)
    return spark


def _write(spark, path, lo, hi, name=None, codec="deflate"):
    df = spark.createDataFrame(
        [(i, f"u{i % 5}", float(i), i % 3 == 0)
         for i in range(lo, hi)],
        "id long, name string, v double, f boolean")
    files = write_avro(df.coalesce(1), path, codec=codec,
                       block_bytes=1 << 12)
    if name:  # deterministic, append-ordered file name
        dst = os.path.join(path, name)
        os.rename(files[0], dst)
        return dst
    return files[0]


def test_batch_parity_and_split_option(av_spark, tmp_path):
    p = str(tmp_path / "av")
    _write(av_spark, p, 0, 4000, name="part-000.avro")
    got = (av_spark.read.format("minerva_avro")
           .option("split_bytes", 1 << 12).load(p))
    assert _rows(got) == _rows(read_avro(av_spark, p))
    assert got.schema == read_avro(av_spark, p).schema
    # small split_bytes shatters the single file into many tasks
    assert got.rdd.getNumPartitions() >= 4
    assert got.agg(F.sum("id")).collect()[0][0] == \
        4000 * 3999 // 2


def test_batch_logical_types_schema(av_spark, tmp_path):
    """Schema derivation through the data source: date /
    timestamp-micros logical types map to Spark date/timestamp."""
    from tests.test_avro_vector import _ALL_VARINT
    from tests.test_iceberg import _avro_file

    d = tmp_path / "av"
    os.makedirs(d)
    recs = [{"id": 1, "small": 2, "flag": True, "kind": "B",
             "d": 19000, "ts": 1_700_000_000_000_000,
             "tms": 1_700_000_000_000}]
    (d / "p.avro").write_bytes(_avro_file(_ALL_VARINT, recs))
    got = av_spark.read.format("minerva_avro").load(str(d))
    types = dict((f.name, f.dataType.simpleString())
                 for f in got.schema.fields)
    assert types["d"] == "date"
    assert types["ts"] == "timestamp" and types["tms"] == "timestamp"
    assert _rows(got) == _rows(read_avro(av_spark, str(d)))


def test_stream_checkpointed_continuation(av_spark, tmp_path):
    """availableNow + checkpoint (parquet sink, which supports
    recovery): the second run appends ONLY the file that arrived
    after the first run's high-water mark."""
    p = str(tmp_path / "av")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write(av_spark, p, 0, 100, name="part-000.avro")
    _write(av_spark, p, 100, 200, name="part-001.avro")

    def run():
        q = (av_spark.readStream.format("minerva_avro").load(p)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    run()
    assert av_spark.read.parquet(out).count() == 200
    _write(av_spark, p, 200, 250, name="part-002.avro")
    run()
    got = _rows(av_spark.read.parquet(out).select("id"))
    assert got == [(i,) for i in range(250)]


def test_stream_out_of_order_file_fails_loudly(av_spark, tmp_path):
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException)

    p = str(tmp_path / "av")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write(av_spark, p, 0, 50, name="part-005.avro")

    def run():
        q = (av_spark.readStream.format("minerva_avro").load(p)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    run()
    # arrives sorting BEFORE the processed part-005
    _write(av_spark, p, 50, 60, name="part-001.avro")
    with pytest.raises(StreamingQueryException,
                       match="high-water|append-ordered"):
        run()


def test_batch_mixed_schema_refuses(av_spark, tmp_path):
    from tests.test_avro_vector import _ALL_VARINT
    from tests.test_iceberg import _avro_file

    p = str(tmp_path / "av")
    _write(av_spark, p, 0, 10, name="part-000.avro")
    with open(os.path.join(p, "part-001.avro"), "wb") as fh:
        fh.write(_avro_file(_ALL_VARINT, []))
    with pytest.raises(Exception, match="differs|mixed-schema"):
        av_spark.read.format("minerva_avro").load(p).collect()


# ------------------------------------------------------------ writer


def test_batch_writer_roundtrip_and_append_order(av_spark, tmp_path):
    """df.write.format('minerva_avro'): append-only, one container
    per task, final names keep sorted append order across jobs so
    the streaming source can tail the directory."""
    import time

    p = str(tmp_path / "out")
    df1 = av_spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5)], "id long, s string, v double")
    df1.coalesce(1).write.format("minerva_avro").mode("append").save(p)
    time.sleep(0.01)
    df2 = av_spark.createDataFrame(
        [(3, "c", 3.5)], "id long, s string, v double")
    df2.coalesce(1).write.format("minerva_avro").mode("append").save(p)
    names = sorted(f for f in os.listdir(p) if f.endswith(".avro"))
    assert len(names) == 2 and names == sorted(names)
    back = read_avro(av_spark, p)
    assert _rows(back) == [(1, "a", 1.5), (2, None, 2.5),
                           (3, "c", 3.5)]
    # and through the registered reader too
    assert _rows(av_spark.read.format("minerva_avro").load(p)) == \
        _rows(back)
    # overwrite refuses (drop directories are append-only)
    with pytest.raises(Exception, match="append-only"):
        df1.write.format("minerva_avro").mode("overwrite").save(p)


def test_stream_writer_end_to_end_and_exactly_once(av_spark,
                                                   tmp_path):
    """Streaming sink: parquet-dir source → minerva_avro sink with a
    checkpoint; a replayed batch id commits nothing (the
    part-<batchId> prefix is the ledger)."""
    import pyarrow as pa

    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamWriter)

    src = str(tmp_path / "src")
    os.makedirs(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    av_spark.createDataFrame([(i, float(i)) for i in range(50)],
                             "id long, v double") \
        .coalesce(1).write.mode("append").parquet(src)
    q = (av_spark.readStream.schema("id long, v double").parquet(src)
         .writeStream.format("minerva_avro").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = read_avro(av_spark, out)
    assert got.count() == 50
    assert sorted(f for f in os.listdir(out)
                  if f.endswith(".avro"))[0].startswith("part-00000")

    # unit-level replay: same batchId committed twice adds nothing
    w = _AvroStreamWriter(
        {"path": out}, av_spark.createDataFrame(
            [], "id long, v double").schema, False)
    batch = pa.RecordBatch.from_pydict(
        {"id": pa.array([99], type=pa.int64()),
         "v": pa.array([9.0])})
    msgs = [w.write(iter([batch]))]
    w.commit(msgs, 7)
    n_after_first = read_avro(av_spark, out).count()
    msgs = [w.write(iter([batch]))]
    w.commit(msgs, 7)  # replay of batch 7
    assert read_avro(av_spark, out).count() == n_after_first == 51
    # temps are cleaned either way
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def _mk_stream_writer(spark, out):
    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamWriter)

    return _AvroStreamWriter(
        {"path": out},
        spark.createDataFrame([], "id long, v double").schema, False)


def _batch_of(ids):
    import pyarrow as pa

    return pa.RecordBatch.from_pydict(
        {"id": pa.array(ids, type=pa.int64()),
         "v": pa.array([float(i) for i in ids])})


def test_stream_sink_crash_between_renames_replays_fully(
        av_spark, tmp_path):
    """r8 advice (medium): a driver crash after SOME renames but
    before the ledger must not lose the unrenamed tasks' rows — the
    markerless partial prefix stays invisible to readers and the
    replayed batch deletes it and commits the FULL batch exactly
    once."""
    out = str(tmp_path / "out")
    w = _mk_stream_writer(av_spark, out)
    # attempt 1: two task outputs; simulate a crash by renaming only
    # the first temp to its final name (what a mid-_finalize death
    # leaves) and never writing the ledger
    m1, m2 = (w.write(iter([_batch_of([1])])),
              w.write(iter([_batch_of([2])])))
    os.rename(m1.tmp,
              os.path.join(out, "part-0000000003-00000-aaaaaaaa.avro"))
    os.remove(m2.tmp)  # this task's rename never happened
    # the partial batch is INVISIBLE (no ledger): reader sees nothing
    import pytest as _pytest

    from python_minerva_etl_spark.sources.avro import _list_files
    with _pytest.raises(FileNotFoundError):
        _list_files(out)
    # replay of batch 3 with fresh task outputs
    msgs = [w.write(iter([_batch_of([1])])),
            w.write(iter([_batch_of([2])]))]
    w.commit(msgs, 3)
    assert os.path.exists(
        os.path.join(out, ".batch-0000000003.committed"))
    got = _rows(read_avro(av_spark, out).select("id"))
    assert got == [(1,), (2,)]  # full batch, exactly once
    # the crashed attempt's stray file was removed
    names = sorted(f for f in os.listdir(out) if f.endswith(".avro"))
    assert len(names) == 2
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_batch_writer_monotonic_ladder_under_clock_regression(
        av_spark, tmp_path, monkeypatch):
    """r8 advice: batch seqs derive from the directory's max existing
    seq, not bare wall clock — a backwards clock cannot break the
    sorted-name append order."""
    import time

    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroWriter)

    p = str(tmp_path / "out")
    schema = av_spark.createDataFrame(
        [], "id long, v double").schema
    w = _AvroWriter({"path": p}, schema, False)
    w.commit([w.write(iter([_batch_of([1])]))])
    first = sorted(f for f in os.listdir(p)
                   if f.endswith(".avro"))[0]
    real_time = time.time
    monkeypatch.setattr(time, "time", lambda: real_time() - 3600)
    w.commit([w.write(iter([_batch_of([2])]))])
    names = sorted(f for f in os.listdir(p) if f.endswith(".avro"))
    assert len(names) == 2 and names[0] == first
    seqs = [int(n.split("-", 2)[1]) for n in names]
    assert seqs[1] == seqs[0] + 1  # ladder, not the regressed clock
    assert read_avro(av_spark, p).count() == 2


def test_batch_and_stream_writers_refuse_shared_directory(
        av_spark, tmp_path):
    """10-digit stream seqs and 15-digit batch seqs sort against
    each other — each writer refuses a directory owned by the
    other, loudly."""
    import pytest as _pytest

    df = av_spark.createDataFrame([(1, 1.0)], "id long, v double")
    # stream-owned dir: batch append refuses
    s_dir = str(tmp_path / "s")
    w = _mk_stream_writer(av_spark, s_dir)
    w.commit([w.write(iter([_batch_of([9])]))], 0)
    with _pytest.raises(Exception, match="STREAMING-sink"):
        df.coalesce(1).write.format("minerva_avro") \
            .mode("append").save(s_dir)
    # batch-owned dir: stream commit refuses
    b_dir = str(tmp_path / "b")
    df.coalesce(1).write.format("minerva_avro").mode("append") \
        .save(b_dir)
    w2 = _mk_stream_writer(av_spark, b_dir)
    msg = w2.write(iter([_batch_of([9])]))
    with _pytest.raises(ValueError, match="must not share"):
        w2.commit([msg], 0)


def test_stream_offsets_name_range_semantics(av_spark, tmp_path):
    """r8 advice (low): a file landing between latestOffset and
    partitions that sorts INSIDE the batch's name range is processed
    by that batch (name ranges tile the name space); one sorting at
    or below a processed high-water mark fails the NEXT batch
    loudly."""
    import pytest as _pytest

    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamReader)

    p = str(tmp_path / "av")
    _write(av_spark, p, 0, 10, name="part-000.avro")
    _write(av_spark, p, 10, 20, name="part-004.avro")
    r = _AvroStreamReader({"path": p, "split_bytes": str(1 << 30)})
    start = r.initialOffset()
    end = r.latestOffset()
    assert end == {"n": 2, "hw": "part-004.avro"}
    # straggler arrives inside ("", "part-004.avro"] before planning
    _write(av_spark, p, 20, 30, name="part-002.avro")
    parts = r.partitions(start, end)
    assert len(parts) == 3  # the straggler is owned by THIS batch
    assert sorted(os.path.basename(q.path) for q in parts) == \
        ["part-000.avro", "part-002.avro", "part-004.avro"]
    # next batch: the count below the watermark no longer matches —
    # append-order contract violation surfaces loudly
    with _pytest.raises(ValueError, match="below the watermark|changed"):
        r.partitions(end, r.latestOffset())
    # removal of the end file is equally loud
    start2 = {"n": 3, "hw": "part-004.avro"}
    _write(av_spark, p, 30, 40, name="part-006.avro")
    end2 = r.latestOffset()
    os.remove(os.path.join(p, "part-006.avro"))
    with _pytest.raises(ValueError, match="missing|removed"):
        r.partitions(start2, end2)


def test_stream_offsets_exactly_once_property():
    """Property (hypothesis): for ANY arrival order of file names and
    ANY trigger cut points — including a file landing in the race
    window between latestOffset and partitions — the name-range
    offset semantics either process every visible file EXACTLY once
    or fail loudly at the first append-order violation.  No Spark:
    drives _AvroStreamReader's offset methods directly."""
    import shutil
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamReader)
    from tests.test_avro_vector import _ALL_VARINT
    from tests.test_iceberg import _avro_file

    names = [f"part-{i:03d}.avro" for i in range(10)]
    blob = _avro_file(_ALL_VARINT, [
        {"id": 1, "small": 2, "flag": True, "kind": "B",
         "d": 1, "ts": 2, "tms": 3}])

    @settings(max_examples=30, deadline=None)
    @given(order=st.permutations(names),
           cuts=st.lists(st.integers(min_value=1, max_value=4),
                         min_size=2, max_size=6),
           race=st.booleans(),
           cap=st.sampled_from([None, 1, 2]))
    def run(order, cuts, race, cap):
        d = tempfile.mkdtemp(prefix="avro_prop_")
        try:
            pending = list(order)

            def land(k):
                new = pending[:k]
                del pending[:k]
                for n in new:
                    with open(os.path.join(d, n), "wb") as fh:
                        fh.write(blob)
                return new

            land(1)  # reader needs one file for schema planning
            opts = {"path": d}
            if cap is not None:  # admission control under the same
                # adversarial schedules: exactly-once must hold and
                # loud failures stay tied to append-order violations
                opts["maxFilesPerTrigger"] = str(cap)
            r = _AvroStreamReader(opts)
            start = r.initialOffset()
            processed: list[str] = []
            dead = False
            # an arrival sorting at or below ANY offset hw issued
            # so far violates append order; the stream may legally
            # detect it at any LATER partitions call (the count
            # cross-check fires when the next batch is planned), so
            # the flag is cumulative, not per-iteration
            issued = start.get("hw") or ""
            violated = False
            # capped readers advance at most `cap` files per trigger:
            # append drain-only triggers so every schedule reaches
            # its fixpoint before the exactly-once assertion
            steps = list(cuts) + [0] * (len(names) // (cap or 99) + 1)
            for i, k in enumerate(steps):
                arrived = land(k) if i else []
                violated |= any(n <= issued for n in arrived)
                end = r.latestOffset()
                issued = max(issued, end.get("hw") or "")
                if race and pending:
                    late = land(1)  # the latestOffset→partitions
                    # race window
                    violated |= any(n <= issued for n in late)
                try:
                    parts = r.partitions(start, end)
                except ValueError:
                    assert violated, (
                        "raised without an append-order violation: "
                        f"start={start} end={end}")
                    dead = True
                    break
                got = [os.path.basename(q.path) for q in parts]
                processed.extend(got)
                start = end
            if not dead:
                # exactly once: nothing twice, and everything at or
                # below the final high-water mark exactly once
                assert len(processed) == len(set(processed))
                hw = start.get("hw") or ""
                on_disk = sorted(
                    n for n in os.listdir(d)
                    if n.endswith(".avro") and n <= hw)
                assert sorted(processed) == on_disk
        finally:
            shutil.rmtree(d, ignore_errors=True)

    run()


def test_max_files_per_trigger_offset_walk(av_spark, tmp_path):
    """Admission-control semantics, locked at the offset level
    (Spark's measured call order: latestOffset BEFORE any start
    knowledge, so the first offset of a run is uncapped; every
    later one advances at most K files past the watermark)."""
    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamReader)

    p = str(tmp_path / "av")
    for i in range(5):
        _write(av_spark, p, i * 10, (i + 1) * 10,
               name=f"part-{i:03d}.avro")

    r = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "2"})
    # blind first call: uncapped (no start offset exists yet)
    o1 = r.latestOffset()
    assert o1 == {"n": 5, "hw": "part-004.avro"}
    # live arrivals: capped walk, 2 files per trigger
    for i in range(5, 9):
        _write(av_spark, p, i * 10, (i + 1) * 10,
               name=f"part-{i:03d}.avro")
    o2 = r.latestOffset()
    assert o2 == {"n": 7, "hw": "part-006.avro"}
    # the batch owns exactly the capped name range
    parts = r.partitions(o1, o2)
    assert sorted(os.path.basename(x.path) for x in parts) == \
        ["part-005.avro", "part-006.avro"]
    o3 = r.latestOffset()
    assert o3["hw"] == "part-008.avro"
    # drained: offset stops advancing (no empty batch churn)
    assert r.latestOffset() == o3

    # restart replaying an uncommitted batch: partitions() primes
    # the watermark, so the NEXT offset is capped relative to it
    r2 = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "2"})
    r2.partitions(o2, o3)
    _write(av_spark, p, 90, 100, name="part-009.avro")
    assert r2.latestOffset() == {"n": 10, "hw": "part-009.avro"}

    # fresh-start order with initialOffset first (future-proofing):
    # the epoch primes the watermark, cold backlog drains capped
    r3 = _AvroStreamReader({"path": p, "maxFilesPerTrigger": "3"})
    r3.initialOffset()
    assert r3.latestOffset() == {"n": 3, "hw": "part-002.avro"}

    # uncapped reader unchanged by the feature
    r4 = _AvroStreamReader({"path": p})
    assert r4.latestOffset()["hw"] == "part-009.avro"

    with pytest.raises(ValueError, match="maxFilesPerTrigger"):
        _AvroStreamReader({"path": p, "maxFilesPerTrigger": "0"})


def test_max_files_per_trigger_live_stream(av_spark, tmp_path):
    """End-to-end admission control: files dropped while the query
    runs drain at most one per micro-batch, and every row arrives
    exactly once."""
    import time
    import uuid as _uuid

    p = str(tmp_path / "av")
    stage = str(tmp_path / "stage")

    def drop(lo, hi, name):
        # stage OUTSIDE the watched directory, then one atomic
        # rename in — a live tail must never see half-landed names
        src = _write(av_spark, stage, lo, hi, name=name)
        os.makedirs(p, exist_ok=True)
        os.rename(src, os.path.join(p, name))

    drop(0, 10, "part-000.avro")
    sink = f"mft_live_{_uuid.uuid4().hex[:8]}"
    q = (av_spark.readStream.format("minerva_avro")
         .option("maxFilesPerTrigger", "1").load(p)
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")
         .trigger(processingTime="250 milliseconds").start())
    try:
        deadline = time.time() + 120
        while (av_spark.table(sink).count() < 10
               and time.time() < deadline):
            time.sleep(0.25)
        assert av_spark.table(sink).count() == 10
        for i in range(1, 5):
            drop(i * 10, (i + 1) * 10, f"part-{i:03d}.avro")
        while (av_spark.table(sink).count() < 50
               and time.time() < deadline):
            time.sleep(0.25)
        got = _rows(av_spark.table(sink).select("id"))
        assert got == [(i,) for i in range(50)]
        # every non-empty batch after the blind first one took at
        # most one file (10 rows)
        sizes = [int(pr["numInputRows"]) for pr in q.recentProgress
                 if int(pr["batchId"]) >= 1
                 and int(pr["numInputRows"]) > 0]
        assert sizes and max(sizes) <= 10 and len(sizes) >= 4
    finally:
        q.stop()


def test_max_bytes_per_trigger_offset_walk(av_spark, tmp_path):
    """maxBytesPerTrigger: the capped walk stops before the byte
    budget overflows, one oversized file still drains alone, and
    combining with maxFilesPerTrigger applies the stricter cap."""
    from python_minerva_etl_spark.streaming.avro_source import (
        _AvroStreamReader)

    p = str(tmp_path / "av")
    for i in range(3):
        _write(av_spark, p, i * 10, (i + 1) * 10,
               name=f"part-{i:03d}.avro")
    sizes = {n: os.path.getsize(os.path.join(p, n))
             for n in sorted(os.listdir(p))}
    one = sizes["part-000.avro"]  # files are same-shaped

    # budget of ~1.5 files -> one file per trigger
    r = _AvroStreamReader({"path": p,
                           "maxBytesPerTrigger": str(int(one * 1.5))})
    r.latestOffset()  # blind first call, uncapped
    for i in range(3, 7):
        _write(av_spark, p, i * 10, (i + 1) * 10,
               name=f"part-{i:03d}.avro")
    assert r.latestOffset()["hw"] == "part-003.avro"
    assert r.latestOffset()["hw"] == "part-004.avro"

    # budget below ONE file: still advances one per trigger
    r2 = _AvroStreamReader({"path": p, "maxBytesPerTrigger": "1"})
    r2.partitions({"n": 5, "hw": "part-004.avro"},
                  {"n": 5, "hw": "part-004.avro"})
    assert r2.latestOffset()["hw"] == "part-005.avro"
    assert r2.latestOffset()["hw"] == "part-006.avro"

    # combined caps: bytes allow 2+, files cap at 1 -> stricter wins
    r3 = _AvroStreamReader({"path": p,
                            "maxBytesPerTrigger": str(one * 10),
                            "maxFilesPerTrigger": "1"})
    r3.partitions({"n": 4, "hw": "part-003.avro"},
                  {"n": 4, "hw": "part-003.avro"})
    assert r3.latestOffset()["hw"] == "part-004.avro"

    with pytest.raises(ValueError, match="maxBytesPerTrigger"):
        _AvroStreamReader({"path": p, "maxBytesPerTrigger": "0"})
