"""Delta maintenance ops: OPTIMIZE (bin-packing compaction +
physical DV purge, dataChange=false) and VACUUM (retention-gated
physical deletion of tombstoned/orphaned files, DV-bin aware)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_minerva_etl_spark.storage.delta import (DeltaTable,
                                                    delete_delta,
                                                    read_delta,
                                                    write_delta)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _active(p):
    return DeltaTable(p)._replay()["files"]


def _commit_kinds(p, v):
    with open(os.path.join(p, "_delta_log", f"{v:020d}.json")) as fh:
        return [json.loads(l) for l in fh if l.strip()]


def test_optimize_binpacks_small_files(spark, tmp_path):
    p = str(tmp_path / "t")
    for lo in (0, 10, 20):
        write_delta(spark, spark.range(lo, lo + 10).toDF("id"), p)
    before = len(_active(p))
    assert before >= 3
    v = DeltaTable(p).optimize(spark)
    assert v == 3
    after = _active(p)
    assert len(after) < before
    got = read_delta(spark, p)
    assert got.count() == 30
    assert _rows(got) == [(i,) for i in range(30)]
    # compaction is dataChange=false on BOTH sides of the rewrite
    for act in _commit_kinds(p, v):
        for kind in ("add", "remove"):
            if act.get(kind):
                assert act[kind]["dataChange"] is False
    # time travel to the pre-compaction snapshot still works
    assert read_delta(spark, p, version_as_of=2).count() == 30


def test_optimize_purges_deletion_vectors(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 100).toDF("id"), p)
    delete_delta(spark, p, "id % 2 = 0")
    assert any(f.get("deletionVector") for f in _active(p))
    v = DeltaTable(p).optimize(spark)
    assert v is not None
    assert not any(f.get("deletionVector") for f in _active(p))
    got = read_delta(spark, p)
    assert got.count() == 50
    assert got.filter("id % 2 = 0").count() == 0


def test_optimize_noop_returns_none(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 10).toDF("id").coalesce(1), p)
    assert DeltaTable(p).optimize(spark, small_file_bytes=1) is None
    assert DeltaTable(p).versions()[-1] == 0


def test_optimize_partitioned_merges_within_partition(spark,
                                                      tmp_path):
    p = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, part string")
    df2 = spark.createDataFrame(
        [(3, "a"), (4, "b")], "id long, part string")
    dt = DeltaTable(p)
    dt.write(spark, df1, partition_by=["part"])
    dt.write(spark, df2, partition_by=["part"])
    v = dt.optimize(spark)
    assert v is not None
    files = _active(p)
    by_part = {}
    for f in files:
        by_part.setdefault(f["partitionValues"]["part"], []).append(f)
    assert set(by_part) == {"a", "b"}
    assert all(len(fs) == 1 for fs in by_part.values())
    assert _rows(read_delta(spark, p)) == [
        (1, "a"), (2, "b"), (3, "a"), (4, "b")]


def test_optimize_allowed_on_append_only_tables(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 5).toDF("id"), p)
    write_delta(spark, spark.range(5, 10).toDF("id"), p)
    log = os.path.join(p, "_delta_log", f"{0:020d}.json")
    with open(log) as fh:
        lines = [json.loads(l) for l in fh if l.strip()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.appendOnly": "true"}
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    # dataChange=false removes are protocol-legal on appendOnly
    assert DeltaTable(p).optimize(spark) is not None
    assert read_delta(spark, p).count() == 10


def test_vacuum_deletes_expired_tombstones_only(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 10).toDF("id"), p)
    old_files = {f["path"] for f in _active(p)}
    write_delta(spark, spark.range(10, 20).toDF("id"), p,
                mode="overwrite")
    dt = DeltaTable(p)
    with pytest.raises(ValueError, match="retention"):
        dt.vacuum(retention_hours=0)
    future = int(time.time() * 1000) + 10_000
    deleted = dt.vacuum(retention_hours=0, now_ms=future,
                        allow_short_retention=True)
    assert old_files <= set(deleted)
    for rel in old_files:
        assert not os.path.exists(os.path.join(p, rel))
    # active snapshot unharmed; the log itself untouched
    assert read_delta(spark, p).count() == 10
    assert os.path.isdir(os.path.join(p, "_delta_log"))


def test_vacuum_respects_retention_window(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(spark, spark.range(0, 5).toDF("id"), p)
    old_files = {f["path"] for f in _active(p)}
    write_delta(spark, spark.range(5, 9).toDF("id"), p,
                mode="overwrite")
    # retention window still open: nothing is deleted
    deleted = DeltaTable(p).vacuum(retention_hours=168)
    assert deleted == []
    for rel in old_files:
        assert os.path.exists(os.path.join(p, rel))


def test_vacuum_handles_dv_bins(spark, tmp_path):
    """Active DV bins must survive; once OPTIMIZE rewrites the files
    (tombstoning the DV-carrying adds), the bins become vacuumable."""
    p = str(tmp_path / "t")
    # enough masked rows that the DV exceeds the inline threshold
    # and lands in .bin files
    write_delta(spark, spark.range(0, 20000).toDF("id").coalesce(2),
                p)
    delete_delta(spark, p, "id % 2 = 0")
    bins = [n for n in os.listdir(p)
            if n.startswith("deletion_vector_")]
    assert bins
    dt = DeltaTable(p)
    future = int(time.time() * 1000) + 10_000
    deleted = dt.vacuum(retention_hours=0, now_ms=future,
                        allow_short_retention=True)
    for b in bins:
        assert b not in deleted  # active DV bin survives
        assert os.path.exists(os.path.join(p, b))
    assert read_delta(spark, p).count() == 10000
    dt.optimize(spark)
    future = int(time.time() * 1000) + 10_000
    deleted = dt.vacuum(retention_hours=0, now_ms=future,
                        allow_short_retention=True)
    assert set(bins) <= set(deleted)
    for b in bins:
        assert not os.path.exists(os.path.join(p, b))
    got = read_delta(spark, p)
    assert got.count() == 10000
    assert got.filter("id % 2 = 0").count() == 0


def test_optimize_zorder_prunes_every_dimension(spark, tmp_path):
    """OPTIMIZE ZORDER BY (x, y): after the Morton-interleaved
    rewrite, per-file stats prune range predicates on EITHER
    dimension — the property a lexicographic sort_by=['x'] only
    gives its leading column.  Pruning is proven the hard way:
    the excluded parquet files are DELETED from disk and the
    filtered read still answers exactly."""
    import os

    from python_minerva_etl_spark.storage.delta import _add_may_match

    def grid_table(p):
        dt = DeltaTable(p)
        # the full 64x64 grid: x and y are INDEPENDENT (y is the
        # high digit, not an affine image of x -- 37*x%64 style
        # mappings are bijections of x and would cluster for free)
        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"),
            ((F.col("id") / 64).cast("long") % 64).alias("y"),
            F.col("id").alias("v"))
        dt.write(spark, df.repartition(8))
        return dt

    def candidates(dt, preds):
        snap = dt._replay()
        type_of = {"x": T.LongType(), "y": T.LongType(),
                   "v": T.LongType()}
        return snap["files"], [
            f for f in snap["files"]
            if _add_may_match(f, preds, [], type_of)]

    box = [("x", ">=", 0), ("x", "<=", 7),
           ("y", ">=", 0), ("y", "<=", 7)]
    y_only = [("y", ">=", 0), ("y", "<=", 7)]

    # lexicographic clustering on x: y-only predicates prune NOTHING
    p1 = str(tmp_path / "lex")
    dt1 = grid_table(p1)
    total = sum(f["size"] for f in dt1._replay()["files"])
    dt1.optimize(spark, target_file_bytes=max(1, total // 16),
                 sort_by=["x"])
    all1, y1 = candidates(dt1, y_only)
    assert len(all1) >= 8
    assert len(y1) == len(all1)          # every file spans full y

    # Z-ORDER on (x, y): both dimensions prune
    p2 = str(tmp_path / "zo")
    dt2 = grid_table(p2)
    expected = sorted(
        (r.x, r.y, r.v) for r in dt2.read(spark).collect()
        if r.x <= 7 and r.y <= 7)
    total = sum(f["size"] for f in dt2._replay()["files"])
    v = dt2.optimize(spark, target_file_bytes=max(1, total // 16),
                     zorder_by=["x", "y"])
    assert v is not None
    all2, y2 = candidates(dt2, y_only)
    _, xy2 = candidates(dt2, box)
    assert len(all2) >= 8
    assert len(y2) < len(all2)           # y alone prunes files
    assert len(xy2) <= len(y2)
    assert len(xy2) < len(all2) // 2     # the box touches a corner

    # never-opened proof: remove every non-candidate file, then the
    # filtered read must still answer bit-for-bit
    keep = {f["path"] for f in xy2}
    for f in all2:
        if f["path"] not in keep:
            os.remove(os.path.join(p2, f["path"]))
    got = sorted((r.x, r.y, r.v)
                 for r in dt2.read(spark, where=box).collect())
    assert got == expected


def test_optimize_zorder_typed_proxies_and_refusals(spark, tmp_path):
    """String/timestamp/date columns Z-ORDER through order-preserving
    proxies; unsupported types and sort_by+zorder_by refuse."""
    import datetime

    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    rows = [(i, f"user{i % 50:03d}",
             datetime.datetime(2024, 1, 1 + i % 28, i % 24),
             datetime.date(2024, 1 + i % 12, 1),
             [i]) for i in range(600)]
    dt.write(spark, spark.createDataFrame(
        rows, "v long, name string, ts timestamp, d date,"
        " arr array<bigint>").repartition(4))
    before = sorted((r.v, r.name, r.ts, r.d, tuple(r.arr))
                    for r in dt.read(spark).collect())
    assert dt.optimize(spark, target_file_bytes=1 << 12,
                       zorder_by=["name", "ts", "d"]) is not None
    after = sorted((r.v, r.name, r.ts, r.d, tuple(r.arr))
                   for r in dt.read(spark).collect())
    assert after == before                # rewrite is content-exact

    with pytest.raises(ValueError, match="unsupported type"):
        dt.optimize(spark, zorder_by=["arr"])
    with pytest.raises(ValueError, match="not both"):
        dt.optimize(spark, sort_by=["v"], zorder_by=["name"])
    with pytest.raises(ValueError, match="not in the"):
        dt.optimize(spark, zorder_by=["nope"])


def test_optimize_zorder_incremental_rewrites_only_new_files(
        spark, tmp_path):
    """incremental=True clusters ONLY files added since the last
    same-column zorder commit: the big clustered set is untouched
    (paths survive byte-for-byte), the appended run clusters on its
    own, stats prune both runs, and a drained table no-ops."""
    import os

    from python_minerva_etl_spark.storage.delta import _add_may_match

    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    base = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") / 64).cast("long") % 64).alias("y"),
        F.col("id").alias("v"))
    dt.write(spark, base.repartition(8))
    total = sum(f["size"] for f in dt._replay()["files"])
    assert dt.optimize(spark, target_file_bytes=max(1, total // 8),
                       zorder_by=["x", "y"]) is not None
    clustered = {f["path"] for f in dt._replay()["files"]}
    mtimes = {f: os.path.getmtime(os.path.join(p, f))
              for f in clustered}

    extra = spark.range(4096, 8192).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") / 64).cast("long") % 64).alias("y"),
        F.col("id").alias("v"))
    dt.write(spark, extra.repartition(4))
    v = dt.optimize(spark, target_file_bytes=max(1, total // 8),
                    zorder_by=["x", "y"], incremental=True)
    assert v is not None
    after = {f["path"] for f in dt._replay()["files"]}
    # the original clustered run survives untouched
    assert clustered <= after
    for f, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(p, f)) == mt
    new_run = after - clustered
    assert new_run  # the appended files were re-clustered

    # stats prune across BOTH runs
    t_of = {"x": T.LongType(), "y": T.LongType(), "v": T.LongType()}
    box = [("x", ">=", 0), ("x", "<=", 7),
           ("y", ">=", 0), ("y", "<=", 7)]
    files = dt._replay()["files"]
    match = [f for f in files if _add_may_match(f, box, [], t_of)]
    assert len(match) < len(files) // 2

    # content exact: both appends fully present
    got = sorted((r.x, r.y, r.v) for r in dt.read(spark).collect())
    want = sorted((r.x, r.y, r.v)
                  for r in base.unionAll(extra).collect())
    assert got == want

    # nothing new arrived -> no-op, no empty commit
    assert dt.optimize(spark, zorder_by=["x", "y"],
                       incremental=True) is None
    # different column list = different curve: NOT incremental over
    # the (x,y) history; falls back to a full rewrite
    assert dt.optimize(spark, zorder_by=["y", "x"],
                       incremental=True) is not None
    with pytest.raises(ValueError, match="needs zorder_by"):
        dt.optimize(spark, incremental=True)


def test_maybe_optimize_delta_policy(spark, tmp_path):
    """The metadata-only trigger: below both bounds -> None (and no
    commit); over the file bound -> incremental zorder fires and
    resets the debt; a table with no prior zorder counts ALL files
    as debt."""
    from python_minerva_etl_spark.storage.delta import (
        maybe_optimize_delta)

    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    df = spark.range(2048).select(
        (F.col("id") % 32).alias("x"),
        ((F.col("id") / 32).cast("long") % 32).alias("y"),
        F.col("id").alias("v"))
    dt.write(spark, df.repartition(4))

    # no prior zorder: all 4 files are debt; file bound 8 holds it
    assert maybe_optimize_delta(
        spark, p, ["x", "y"], max_unclustered_files=8) is None
    v0 = dt.versions()[-1]
    # tighten the bound -> the first firing is the full rewrite
    assert maybe_optimize_delta(
        spark, p, ["x", "y"], max_unclustered_files=3,
        target_file_bytes=1 << 62) is not None
    assert dt._last_zorder_version(["x", "y"]) == v0 + 1

    # debt reset: immediately after, nothing to do
    assert maybe_optimize_delta(
        spark, p, ["x", "y"], max_unclustered_files=0) is None

    # new appends accumulate debt until the bound trips
    for i in range(2):
        dt.write(spark, df.limit(100).repartition(1))
    assert maybe_optimize_delta(
        spark, p, ["x", "y"], max_unclustered_files=4) is None
    got = maybe_optimize_delta(
        spark, p, ["x", "y"], max_unclustered_files=1,
        target_file_bytes=1 << 62)
    assert got is not None
    # and the byte bound works too
    dt.write(spark, df.limit(100).repartition(1))
    assert maybe_optimize_delta(
        spark, p, ["x", "y"], max_unclustered_files=99,
        max_unclustered_bytes=1) is not None


def test_maybe_optimize_delta_cm_marker_resets_debt(spark, tmp_path):
    """Column-mapped tables record the zorder marker under PHYSICAL
    column names; the policy hook must look it up the same way or
    the debt never resets and it fires on every call."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from python_minerva_etl_spark.storage.delta import (
        maybe_optimize_delta)
    from tests.test_delta_cm import _add, _fld, _log

    p = str(tmp_path / "t")
    os.makedirs(p)
    pq.write_table(pa.table({
        "col-aaa": pa.array([1, 2, 3, 4], type=pa.int64()),
        "col-bbb": pa.array([9, 8, 7, 6], type=pa.int64())}),
        os.path.join(p, "f0.parquet"))
    _log(p, [_fld("x", "long", "col-aaa", 1),
             _fld("y", "long", "col-bbb", 2)],
         [_add("f0.parquet")])
    dt = DeltaTable(p)
    dt.write(spark, spark.createDataFrame(
        [(5, 5), (6, 4)], "x long, y long").coalesce(1))

    # fires: no marker yet -> whole table is debt
    assert maybe_optimize_delta(
        spark, p, ["x", "y"], max_unclustered_files=0,
        target_file_bytes=1 << 62) is not None
    # debt reset: the physical-name marker must be found
    assert maybe_optimize_delta(
        spark, p, ["x", "y"], max_unclustered_files=0) is None
    got = sorted((r.x, r.y) for r in dt.read(spark).collect())
    assert got == [(1, 9), (2, 8), (3, 7), (4, 6), (5, 5), (6, 4)]


def test_optimize_zorder_nonfinite_doubles(spark, tmp_path):
    """inf/-inf/NaN in a zorder column must not crash the boundary
    literals (non-finite percentile boundaries are dropped; inf rows
    bin last, NaN rows bin first — content stays exact)."""
    import math

    p = str(tmp_path / "t")
    dt = DeltaTable(p)
    rows = [(float(i), i) for i in range(200)]
    rows += [(float("inf"), 900), (float("-inf"), 901),
             (float("nan"), 902)]
    dt.write(spark, spark.createDataFrame(
        rows, "d double, v long").repartition(4))
    assert dt.optimize(spark, target_file_bytes=1 << 12,
                       zorder_by=["d"]) is not None
    got = sorted(r.v for r in dt.read(spark).collect())
    assert got == sorted(list(range(200)) + [900, 901, 902])
    vals = {r.v: r.d for r in dt.read(spark).collect()}
    assert math.isinf(vals[900]) and math.isinf(vals[901])
    assert math.isnan(vals[902])
