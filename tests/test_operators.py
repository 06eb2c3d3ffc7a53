"""Operator-library round-trips: CSV harvest parse, upsert write path,
load pipeline, multimodal decode plumbing — the reference's
integration-test analog (store → read back → assert), against local
parquet instead of PostgreSQL."""

from __future__ import annotations

import os
import shutil

import pytest

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "tests")


@pytest.fixture()
def scratch():
    os.makedirs(SCRATCH, exist_ok=True)
    yield SCRATCH


def test_csv_parse_packages(spark, scratch):
    from python_minerva_etl_spark.sources.csv import (ParserConfig,
                                                      parse_packages)

    path = os.path.join(scratch, "harvest.csv")
    with open(path, "w") as fh:
        fh.write("node;timestamp;pkts;bytes\n"
                 "cell=1;2024-01-01 10:00:00;5;100\n"
                 "cell=2;2024-01-01 10:00:00;;200\n")
    cfg = ParserConfig(delimiter=";", timestamp_column="timestamp",
                       entity_expression="concat('network=g1,', node)",
                       value_columns=("pkts", "bytes"),
                       value_types={"pkts": "integer", "bytes": "bigint"})
    out = parse_packages(spark, path, cfg).orderBy("dn").collect()
    assert out[0].dn == "network=g1,cell=1"
    assert out[0].timestamp.hour == 10
    assert out[0].pkts == 5 and out[0].bytes == 100
    assert out[1].pkts is None  # empty string -> typed NULL


def test_plugin_registry(spark):
    from python_minerva_etl_spark.sources.plugins import get_plugin

    reader = get_plugin("parquet")
    df = reader(spark, "/root/testdata/sf0.001/region.parquet")
    assert df.count() == 5
    with pytest.raises(KeyError):
        get_plugin("vendor-xml-unknown")


def test_plugin_orc_and_jsonl_roundtrip(spark, scratch):
    from python_minerva_etl_spark.sources.plugins import get_plugin

    src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    orc_path = f"{scratch}/region_orc"
    src.write.mode("overwrite").orc(orc_path)
    assert get_plugin("orc")(spark, orc_path).count() == 5

    jl_path = f"{scratch}/docs_jsonl"
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
     .write.mode("overwrite").json(jl_path))
    got = get_plugin("jsonl")(spark, jl_path)
    assert got.count() == spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").count()
    assert "text" in got.columns


def test_upsert_last_wins_across_batches(spark, scratch):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.upsert import upsert_parquet

    path = os.path.join(scratch, "upsert_store")
    shutil.rmtree(path, ignore_errors=True)
    b1 = spark.createDataFrame(
        [(1, "2024-01-01", 10.0, 1), (2, "2024-01-01", 20.0, 1)],
        "entity bigint, bucket string, value double, seq int")
    b2 = spark.createDataFrame(
        [(1, "2024-01-01", 99.0, 2), (3, "2024-01-02", 30.0, 2)],
        "entity bigint, bucket string, value double, seq int")
    upsert_parquet(spark, b1, path, key=["entity", "bucket"],
                   seq_col="seq", partition_col="bucket")
    upsert_parquet(spark, b2, path, key=["entity", "bucket"],
                   seq_col="seq", partition_col="bucket")
    # partition values read back type-inferred (dates) — compare as str
    got = {(r.entity, str(r.bucket)): r.value
           for r in spark.read.parquet(path).collect()}
    assert got[(1, "2024-01-01")] == 99.0   # batch 2 won
    assert got[(2, "2024-01-01")] == 20.0   # untouched key survives
    assert got[(3, "2024-01-02")] == 30.0   # new partition appended


def test_upsert_unpartitioned_staging_swap(spark, scratch):
    """partition_col=None path: resolve + stage + swap — no
    localCheckpoint, table intact through the swap, second batch wins
    on conflicting keys, no staging/retired debris left behind."""
    from python_minerva_etl_spark.operators.upsert import upsert_parquet

    path = os.path.join(scratch, "upsert_flat")
    shutil.rmtree(path, ignore_errors=True)
    b1 = spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "a", 20.0, 1)],
        "entity bigint, bucket string, value double, seq int")
    b2 = spark.createDataFrame(
        [(1, "a", 99.0, 2), (3, "b", 30.0, 2)],
        "entity bigint, bucket string, value double, seq int")
    upsert_parquet(spark, b1, path, key=["entity", "bucket"],
                   seq_col="seq", partition_col=None)
    upsert_parquet(spark, b2, path, key=["entity", "bucket"],
                   seq_col="seq", partition_col=None)
    got = {(r.entity, r.bucket): r.value
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"): 99.0, (2, "a"): 20.0, (3, "b"): 30.0}
    debris = [p for p in os.listdir(scratch)
              if "__staging__" in p or "__retired__" in p]
    assert debris == []


def test_upsert_larger_unpartitioned(spark):
    """The unpartitioned swap at a non-toy size: upsert a 10k-row batch
    over a 60k-row stored table twice (second time as a replay) —
    counts stay stable, replayed values win."""
    import tempfile

    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.upsert import upsert_parquet
    from python_minerva_etl_spark.registry import load_table

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "value", F.lit(1).alias("seq"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "store")
        upsert_parquet(spark, ev, path, key=["event_id"], seq_col="seq")
        n0 = spark.read.parquet(path).count()
        patch = (ev.filter(F.col("event_id") % 6 == 0)
                 .withColumn("value", F.lit(-1.0))
                 .withColumn("seq", F.lit(2)))
        upsert_parquet(spark, patch, path, key=["event_id"], seq_col="seq")
        after = spark.read.parquet(path)
        assert after.count() == n0
        assert (after.filter("event_id % 6 = 0")
                .agg(F.max("value"), F.min("value")).first()) == (-1.0, -1.0)


def test_load_pipeline_end_to_end(spark, scratch):
    """§3.1 flagship: csv → normalize → entity resolve → upsert →
    read back; a re-load of corrected data wins."""
    from python_minerva_etl_spark.plans.load import load_data
    from python_minerva_etl_spark.sources.csv import ParserConfig

    src = os.path.join(scratch, "load1.csv")
    store = os.path.join(scratch, "trend_store")
    mlog = os.path.join(scratch, "modified_log")
    for p in (store, mlog):
        shutil.rmtree(p, ignore_errors=True)
    with open(src, "w") as fh:
        fh.write("entity,timestamp,v\n"
                 "cell=1,2024-01-01 10:00:00,5\n"
                 "cell=2,2024-01-02 10:00:00,7\n")
    cfg = ParserConfig(entity_expression="entity", value_columns=("v",),
                       value_types={"v": "integer"})
    out = load_data(spark, "csv", src, store, cfg,
                    modified_log_path=mlog)
    assert out.count() == 2
    # corrected re-load of the same key
    with open(src, "w") as fh:
        fh.write("entity,timestamp,v\n"
                 "cell=1,2024-01-01 10:00:00,6\n")
    out2 = load_data(spark, "csv", src, store, cfg,
                     modified_log_path=mlog)
    vals = {r.dn: r.v for r in out2.collect()}
    assert vals["cell=1"] == 6 and vals["cell=2"] == 7
    assert spark.read.parquet(mlog).count() >= 2  # modified log appended


def test_multimodal_decode_plumbing(spark):
    """EXT-MM-COL: Arrow-batched decode stage over REAL containers —
    the default codec genuinely parses PNG and WAV payloads (stdlib
    decoders in ext/codecs.py), mixed in one column."""
    from python_minerva_etl_spark.ext.codecs import png_encode, wav_encode
    from python_minerva_etl_spark.ext.multimodal import (attach_asset_meta,
                                                         decode_assets)

    rows = [(i, png_encode(bytes((i + j) % 256 for j in range(12)),
                           4, 3, 1) if i % 2 == 0
             else wav_encode([(i * 37 + j * 11) % 2000 - 1000
                              for j in range(20)]))
            for i in range(40)]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    with_meta = attach_asset_meta(df, "payload", "image/png")
    assert "asset_meta" in with_meta.columns
    checksums = with_meta.select("asset_meta.checksum").distinct().count()
    assert checksums == 40
    decoded = decode_assets(df.repartition(4), "asset_id", "payload", dim=8)
    got = decoded.orderBy("asset_id").collect()
    assert len(got) == 40
    assert all(len(r.feature) == 8 for r in got)
    # PNG rows report real dimensions; WAV rows real sample counts
    assert got[0].feature[:3] == [4.0, 3.0, 1.0]
    assert got[1].feature[0] == 8000.0 and got[1].feature[1] == 20.0
    assert got[0].n_bytes == len(rows[0][1])
    # deterministic across partitionings
    again = decode_assets(df.repartition(2), "asset_id", "payload",
                          dim=8).orderBy("asset_id").collect()
    assert [r.feature for r in got] == [r.feature for r in again]
    # unknown container with the default codec: the stage must raise,
    # not silently pseudo-decode
    import pytest as _pytest
    junk = spark.createDataFrame([(1, b"not-a-container")],
                                 "asset_id long, payload binary")
    with _pytest.raises(Exception, match="unknown container"):
        decode_assets(junk, "asset_id", "payload").collect()


def test_instance_aggregation_compile(spark):
    """§3.3: declarative trend-store spec compiles to the same result
    as the hand-written flagship aggregation."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.plans.instance import (Trend,
                                                         TrendStorePart,
                                                         aggregate_time,
                                                         reaggregate_avg)
    from python_minerva_etl_spark.registry import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    part = TrendStorePart("main", (Trend("value", "double", "avg", "avg"),))
    hourly = aggregate_time(ev, part, "user_id", "ts", "1h")
    assert set(hourly.columns) == {"user_id", "ts", "value", "samples"}
    daily = reaggregate_avg(hourly, "value", "user_id", "ts", "1d")
    # exact re-aggregation invariant: AVG(1d from 1h partials) == direct AVG
    direct = (ev.groupBy("user_id", F.date_trunc("day", "ts").alias("ts"))
              .agg((F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                    / F.count("value").cast("double")).alias("avg_direct")))
    merged = daily.join(direct, ["user_id", "ts"])
    assert daily.count() == direct.count() == merged.count()
    assert merged.filter(F.col("avg_value") != F.col("avg_direct")).count() == 0


def test_csv_type_deduction_automatic(spark, scratch):
    """Columns without declared types get lattice-deduced types from
    the data (OP-TYPE-DEDUCE wired into ingest)."""
    from python_minerva_etl_spark.sources.csv import (ParserConfig,
                                                      parse_packages)

    path = os.path.join(scratch, "deduce.csv")
    with open(path, "w") as fh:
        fh.write("entity,timestamp,small,big,ratio,label\n"
                 "a,2024-01-01 00:00:00,5,3000000000,2.5,x\n"
                 "b,2024-01-01 01:00:00,900,1,7,y\n")
    cfg = ParserConfig(entity_expression="entity")
    out = parse_packages(spark, path, cfg)
    dtypes = dict(out.dtypes)
    assert dtypes["small"] == "smallint"
    assert dtypes["big"] == "bigint"
    assert dtypes["ratio"] == "double"   # generalize(double, smallint)
    assert dtypes["label"] == "string"
    rows = out.orderBy("dn").collect()
    assert rows[0].big == 3000000000 and rows[1].ratio == 7.0


def test_multimodal_custom_codec(spark):
    """decode_assets(codec=...): a caller-supplied decoder ships inside
    the mapInPandas closure — the production slot-in for PIL/ffmpeg."""
    from python_minerva_etl_spark.ext.multimodal import decode_assets

    def byte_sum_codec(payload: bytes, dim: int) -> list[float]:
        s = float(sum(payload))
        return [s] + [0.0] * (dim - 1)

    rows = [(1, b"\x01\x02"), (2, b"\x05")]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r.asset_id: r.feature
           for r in decode_assets(df, "asset_id", "payload", dim=2,
                                  codec=byte_sum_codec).collect()}
    assert got == {1: [3.0, 0.0], 2: [5.0, 0.0]}


def test_entity_aggregation_relation_rollup(spark):
    """plans.aggregate_entity: declared entity rollup along a relation
    equals the hand-written join+group."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.plans.instance import (Relation, Trend,
                                                         TrendStorePart,
                                                         aggregate_entity)
    from python_minerva_etl_spark.registry import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("entity_id"),
        F.date_trunc("day", "o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("price"))
    relation = (load_table(spark, sf, "customer")
                .select(F.col("c_custkey").alias("source_id"),
                        F.col("c_nationkey").alias("target_id")))
    part = TrendStorePart("p", (Trend("price", "double", "sum", "sum"),))
    rolled = aggregate_entity(
        orders, part, relation, Relation("cust_to_nation",
                                         "source_id", "target_id"),
        "entity_id", "ts")
    direct = (orders.join(relation,
                          orders.entity_id == relation.source_id)
              .groupBy(F.col("target_id"), "ts")
              .agg(F.sum(F.col("price").cast("decimal(28,6)"))
                   .alias("price_dec"),
                   F.count("*").alias("samples")))
    a = {(r.entity_id, r.ts): (float(r.price), r.samples)
         for r in rolled.collect()}
    b = {(r.target_id, r.ts): (float(r.price_dec), r.samples)
         for r in direct.collect()}
    assert a == b


def test_asof_join_null_attribute_not_skipped(spark):
    """A genuinely-NULL attribute in the latest history row must be
    returned, not skipped for an older non-null value (regression:
    raw last(ignorenulls) conflated fact filler with real NULLs)."""
    from datetime import datetime

    from python_minerva_etl_spark.operators.joins import asof_join

    hist = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 5.0), (1, datetime(2024, 1, 2), None)],
        "k bigint, ts timestamp, attr_v double")
    facts = spark.createDataFrame(
        [(1, datetime(2024, 1, 3), "f1"), (1, datetime(2024, 1, 1, 12), "f0")],
        "k bigint, ts timestamp, tag string")
    out = {r.tag: r.attr_v for r in asof_join(
        facts, hist, key=["k"], ts_col="ts", attr_cols=["attr_v"]).collect()}
    assert out["f0"] == 5.0      # before the NULL row: old value
    assert out["f1"] is None     # latest row's value IS NULL


def test_asof_join_forward(spark):
    """direction='forward': earliest history at-or-after the fact ts;
    exclusive skips the equal-ts row; facts past the last history row
    get NULL."""
    from datetime import datetime

    from python_minerva_etl_spark.operators.joins import asof_join

    hist = spark.createDataFrame(
        [(1, datetime(2024, 1, 2), 5.0), (1, datetime(2024, 1, 4), 7.0)],
        "k bigint, ts timestamp, attr_v double")
    facts = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "before"),
         (1, datetime(2024, 1, 2), "at"),
         (1, datetime(2024, 1, 3), "between"),
         (1, datetime(2024, 1, 5), "after")],
        "k bigint, ts timestamp, tag string")
    fwd = {r.tag: r.attr_v for r in asof_join(
        facts, hist, key=["k"], ts_col="ts", attr_cols=["attr_v"],
        direction="forward").collect()}
    assert fwd == {"before": 5.0, "at": 5.0, "between": 7.0, "after": None}
    excl = {r.tag: r.attr_v for r in asof_join(
        facts, hist, key=["k"], ts_col="ts", attr_cols=["attr_v"],
        direction="forward", inclusive=False).collect()}
    assert excl["at"] == 7.0     # equal ts excluded, next row wins


def test_stratified_sample_zero_fraction_keeps_nothing(spark):
    """A 0.0 stratum (and 0.0 default) must keep zero rows — the
    strict threshold cannot leak draw==0 rows into an excluded
    language."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.ext.text import stratified_sample
    from python_minerva_etl_spark.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    langs = [r[0] for r in docs.select("lang").distinct().collect()]
    out = stratified_sample(docs, "doc_id", "lang",
                            fractions={langs[0]: 0.0}, default_frac=0.0)
    assert out.count() == 0
    everything = stratified_sample(docs, "doc_id", "lang",
                                   fractions={}, default_frac=1.0)
    assert everything.count() == docs.count()


def test_gap_fill_carries_forward_and_flags(spark):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.gapfill import fill_gaps

    series = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-04", 40.0),
         (2, "2024-01-02", 5.0)],
        "entity long, day string, v double").select(
            "entity", F.col("day").cast("timestamp").alias("day"), "v")
    out = {(r.entity, str(r.day)): (r.v, r.was_gap)
           for r in fill_gaps(series, "entity", "day", "1 day", ["v"])
           .collect()}
    # dense spine per entity span
    assert len(out) == 4 + 1
    # gaps carry the last known value and are flagged
    assert out[(1, "2024-01-02 00:00:00")] == (10.0, True)
    assert out[(1, "2024-01-03 00:00:00")] == (10.0, True)
    assert out[(1, "2024-01-04 00:00:00")] == (40.0, False)


def test_gap_fill_leading_gap_stays_null(spark):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.gapfill import fill_gaps

    series = spark.createDataFrame(
        [(1, "2024-01-01", None), (1, "2024-01-02", 7.0)],
        "entity long, day string, v double").select(
            "entity", F.col("day").cast("timestamp").alias("day"), "v")
    rows = (fill_gaps(series, "entity", "day", "1 day", ["v"])
            .orderBy("day").collect())
    # the day-1 row EXISTS in the source with a NULL value: it is not a
    # gap (presence-marker semantics), and with nothing earlier to
    # carry, the value stays NULL
    assert rows[0].v is None and not rows[0].was_gap
    assert rows[1].v == 7.0


def test_zscore_outliers_flags_only_extremes(spark):
    from python_minerva_etl_spark.operators.trigger import zscore_outliers

    rows = ([(1, float(v)) for v in [10] * 20 + [11] * 20 + [500]]
            + [(2, float(v)) for v in range(5)])  # entity 2: < min_samples
    df = spark.createDataFrame(rows, "entity long, value double")
    got = zscore_outliers(df, "entity", "value",
                          z_threshold=3.0, min_samples=10).collect()
    assert [(r.entity, r.value) for r in got] == [(1, 500.0)]
    assert got[0].z > 3.0


def test_compact_store_partitioned(spark, scratch):
    import glob

    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.compaction import compact_store
    from python_minerva_etl_spark.registry import load_table

    path = os.path.join(scratch, "compact_t")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .withColumn("day", F.to_date("ts").cast("string"))
    # simulate many tiny incremental loads: 8 files per partition
    ev.repartition(8).write.partitionBy("day").mode("overwrite").parquet(path)
    before = ev.groupBy("day").count().orderBy("day").collect()
    n_before = len(glob.glob(os.path.join(path, "day=*", "*.parquet")))
    assert n_before >= 16, "fixture did not fragment — test is vacuous"

    stats = compact_store(spark, path, "day", target_file_bytes=1 << 30)
    n_after = len(glob.glob(os.path.join(path, "day=*", "*.parquet")))
    assert stats["units_compacted"] == stats["units_seen"] > 0
    assert n_after == stats["units_seen"], "expected 1 file per partition"
    after = spark.read.parquet(path).groupBy("day").count() \
        .orderBy("day").collect()
    # partition values read back type-inferred (dates) — compare as str
    assert [(str(r[0]), r[1]) for r in before] == \
        [(str(r[0]), r[1]) for r in after]

    again = compact_store(spark, path, "day", target_file_bytes=1 << 30)
    assert again["units_compacted"] == 0, "recompaction must be a no-op"


def test_compact_store_unpartitioned_respects_target(spark, scratch):
    from python_minerva_etl_spark.operators.compaction import compact_store
    from python_minerva_etl_spark.registry import load_table

    path = os.path.join(scratch, "compact_flat")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(12).write.mode("overwrite").parquet(path)
    n_rows = ev.count()
    _files, n_bytes = __import__(
        "python_minerva_etl_spark.operators.compaction",
        fromlist=["_dir_stats"])._dir_stats(path)
    # pick a target that should land ~3 output files
    stats = compact_store(spark, path, None,
                          target_file_bytes=max(n_bytes // 3, 1))
    assert stats["units_compacted"] == 1
    assert 1 <= stats["files_after"] <= 6
    assert spark.read.parquet(path).count() == n_rows


def test_multimodal_frame_sampling(spark):
    """1:N mapInPandas explode shape: deterministic frame counts,
    custom splitter injection, frames re-decodable downstream."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.ext.multimodal import (decode_assets,
                                                         sample_frames)

    rows = [(i, bytes(range(max(i % 7, 1) * 16))) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    frames = sample_frames(df.repartition(4), "asset_id", "payload",
                           frame_bytes=16, every_n=2)
    got = frames.groupBy("asset_id").count().collect()
    want = {i: (max(i % 7, 1) + 1) // 2 for i in range(1, 30)}
    assert {r.asset_id: r["count"] for r in got} == want
    # frames chain into the decode stage (frame -> feature pipeline);
    # raw byte windows are not containers, so the pseudo-decoder is
    # opted into EXPLICITLY (the default sniff codec would refuse)
    from python_minerva_etl_spark.ext.multimodal import _fake_decode
    feats = decode_assets(
        frames.withColumnRenamed("frame", "payload")
        .withColumn("fid", F.monotonically_increasing_id()),
        "asset_id", "payload", dim=4, codec=_fake_decode)
    assert feats.count() == frames.count()
    # custom splitter injects cleanly
    one = sample_frames(df, "asset_id", "payload",
                        splitter=lambda p, fb, en: [p]).count()
    assert one == len(rows)


def test_gap_interpolate_linear_interior_null_edges(spark):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.gapfill import interpolate_gaps

    series = spark.createDataFrame(
        [(1, "2024-01-02", 10.0), (1, "2024-01-05", 40.0),
         (1, "2024-01-06", 0.0)],
        "entity long, day string, v double").select(
            "entity", F.col("day").cast("timestamp").alias("day"), "v")
    out = {str(r.day): (r.v, r.was_gap)
           for r in interpolate_gaps(series, "entity", "day", "1 day",
                                     ["v"]).collect()}
    # interior gaps take the straight line between (01-02, 10) and
    # (01-05, 40): +10/day
    assert out["2024-01-03 00:00:00"] == (20.0, True)
    assert out["2024-01-04 00:00:00"] == (30.0, True)
    # present rows untouched
    assert out["2024-01-02 00:00:00"] == (10.0, False)
    assert out["2024-01-06 00:00:00"] == (0.0, False)
    # spine spans min..max only: no leading/trailing rows fabricated
    assert len(out) == 5


def test_funnel_requires_strict_order(spark):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.analytics import \
        funnel_conversion

    rows = [
        # u1: full ordered funnel
        (1, "2024-01-01 10:00:00", "signup"),
        (1, "2024-01-02 10:00:00", "click"),
        (1, "2024-01-03 10:00:00", "purchase"),
        # u2: purchase BEFORE the first click -> reaches click only
        (2, "2024-01-01 10:00:00", "signup"),
        (2, "2024-01-02 10:00:00", "purchase"),
        (2, "2024-01-03 10:00:00", "click"),
        # u3: signup only
        (3, "2024-01-01 10:00:00", "signup"),
        # u4: click/purchase but never signed up -> not in funnel
        (4, "2024-01-01 10:00:00", "click"),
        (4, "2024-01-02 10:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    got = funnel_conversion(ev, ["signup", "click", "purchase"]).first()
    assert got.n_signup == 3
    assert got.n_click == 2          # u1, u2
    assert got.n_purchase == 1       # u1 only (u2's purchase predates click)
    assert abs(got.conv_click - 2 / 3) < 1e-12
    assert got.conv_purchase == 0.5


def test_cohort_retention_tracks_cohort_base(spark):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.analytics import \
        cohort_retention

    rows = [
        # cohort week of 2024-01-01 (Mon): users 1,2; user 2 churns
        (1, "2024-01-02 08:00:00"), (1, "2024-01-09 08:00:00"),
        (2, "2024-01-03 08:00:00"),
        # cohort week of 2024-01-08: user 3, active both weeks
        (3, "2024-01-10 08:00:00"), (3, "2024-01-16 08:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")).withColumn(
        "event_type", F.lit("view"))
    got = {(str(r.cohort), r.bucket_ix): (r.n_active, r.retention)
           for r in cohort_retention(ev).collect()}
    assert got[("2024-01-01 00:00:00", 0)] == (2, 1.0)
    assert got[("2024-01-01 00:00:00", 1)] == (1, 0.5)
    assert got[("2024-01-08 00:00:00", 0)] == (1, 1.0)
    assert got[("2024-01-08 00:00:00", 1)] == (1, 1.0)
    assert len(got) == 4


def test_validate_rules_and_quarantine_split(spark):
    from python_minerva_etl_spark.operators.validation import (Rule,
                                                               quarantine,
                                                               validate)

    df = spark.createDataFrame(
        [(1, 10, "a"), (2, -5, "b"), (2, 7, None), (3, 200, "c")],
        "id long, qty long, tag string")
    ref = spark.createDataFrame([("a",), ("b",), ("c",)], "tag string")
    rules = [
        Rule("qty_pos", predicate="qty > 0"),
        Rule("qty_max", predicate="qty <= 100"),
        Rule("id_unique", unique=("id",)),
        Rule("tag_fk", foreign_key=(("tag",), ref, ("tag",))),
    ]
    rep = {r.rule: (r.n_checked, r.n_violations, r["pass"])
           for r in validate(df, rules).collect()}
    assert rep["qty_pos"] == (4, 1, False)       # -5
    assert rep["qty_max"] == (4, 1, False)       # 200
    assert rep["id_unique"] == (4, 1, False)     # id=2 twice
    assert rep["tag_fk"] == (4, 1, False)        # NULL tag not in ref

    clean, bad = quarantine(df, [r for r in rules if r.predicate])
    assert {r.id for r in clean.collect()} == {1, 2}  # rows passing both
    flagged = {(r.id, r.qty): set(r.failed_rules) for r in bad.collect()}
    assert flagged[(2, -5)] == {"qty_pos"}
    assert flagged[(3, 200)] == {"qty_max"}


def test_validate_rule_requires_exactly_one_form():
    import pytest as _pytest

    from python_minerva_etl_spark.operators.validation import Rule

    with _pytest.raises(ValueError):
        Rule("bad", predicate="x > 0", unique=("x",))
    with _pytest.raises(ValueError):
        Rule("empty")


def test_fuzzy_match_blocking_tiebreak_and_no_match(spark):
    from python_minerva_etl_spark.directory import fuzzy_match

    reg = spark.createDataFrame(
        [(1, "cell=A1"), (2, "cell=B1"), (3, "cell=AB1")],
        "id long, name string")
    dirty = spark.createDataFrame(
        [(10, "cell=A1"),      # exact: dist 0 to id 1
         (11, "cell=X1"),      # dist 1 to BOTH A1 and B1 -> min id 1
         (12, "node=zzzzzz")],  # nothing within dist 2 -> absent
        "id long, name string")
    got = {r.src_id: (r.match_id, r.dist)
           for r in fuzzy_match(dirty, reg, "id", "name",
                                "id", "name", max_dist=2).collect()}
    assert got[10] == (1, 0)
    assert got[11] == (1, 1)   # id tiebreak on equal distance
    assert 12 not in got


def test_fuzzy_match_plan_is_broadcast_hash_join(spark):
    """Length blocking must surface as an EQUI join (BroadcastHashJoin)
    — a BroadcastNestedLoopJoin here means the abs(len-diff) predicate
    leaked into the join condition and every registry row is scanned
    per dirty row."""
    import contextlib
    import io

    from python_minerva_etl_spark.directory import fuzzy_match
    from python_minerva_etl_spark.registry import load_table

    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    out = fuzzy_match(cust.select("c_custkey", "c_name"),
                      cust.select("c_custkey", "c_name"),
                      "c_custkey", "c_name", "c_custkey", "c_name")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interpolate_single_point_entity(spark):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.operators.gapfill import interpolate_gaps

    series = spark.createDataFrame(
        [(1, "2024-01-01", 5.0)], "entity long, day string, v double"
    ).select("entity", F.col("day").cast("timestamp").alias("day"), "v")
    rows = interpolate_gaps(series, "entity", "day", "1 day", ["v"]).collect()
    assert len(rows) == 1 and rows[0].v == 5.0 and not rows[0].was_gap


def test_fuzzy_match_empty_dirty_side(spark):
    from python_minerva_etl_spark.directory import fuzzy_match

    reg = spark.createDataFrame([(1, "cell=A1")], "id long, name string")
    dirty = spark.createDataFrame([], "id long, name string")
    assert fuzzy_match(dirty, reg, "id", "name", "id", "name").count() == 0


def test_validate_composite_foreign_key(spark):
    from python_minerva_etl_spark.operators.validation import Rule, validate

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 30)],
        "g long, s string, v long")
    ref = spark.createDataFrame(
        [(1, "a"), (1, "b")], "g long, s string")
    rep = validate(df, [Rule("fk2", foreign_key=(
        ("g", "s"), ref, ("g", "s")))]).collect()[0]
    assert rep["n_violations"] == 1 and rep["n_checked"] == 3
