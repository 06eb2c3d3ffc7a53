"""YAML instance loading (§3.3) + the CLI end-to-end flow:
initialize → load-data → materialize → create-notifications."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch", "cli")

TREND_YAML = """\
data_source: vendor
entity_type: Cell
granularity: 15m
partition_size: 86400
parts:
  - name: main
    trends:
      - name: pkts
        data_type: integer
        time_aggregation: SUM
        entity_aggregation: SUM
      - name: latency
        data_type: double
        time_aggregation: AVG
        entity_aggregation: AVG
"""

TRIGGER_YAML = """\
name: high_latency
kpi: latency
condition: "true"
thresholds:
  - severity: warning
    value: 10.0
    weight: 10
  - severity: critical
    value: 50.0
    weight: 100
"""

RELATION_YAML = """\
name: cell_to_site
source: cell_id
target: site_id
"""


@pytest.fixture(scope="module")
def instance_dir():
    base = os.path.join(SCRATCH, "instance")
    shutil.rmtree(base, ignore_errors=True)
    for sub, name, text in (("trend", "vendor.yaml", TREND_YAML),
                            ("trigger", "high_latency.yaml", TRIGGER_YAML),
                            ("relation", "cell_to_site.yaml", RELATION_YAML)):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
        with open(os.path.join(base, sub, name), "w") as fh:
            fh.write(text)
    return base


def test_yaml_instance_load(instance_dir):
    from python_minerva_etl_spark.plans.yaml_instance import MinervaInstance

    inst = MinervaInstance.load(instance_dir)
    assert len(inst.trend_stores) == 1
    store = inst.trend_stores[0]
    assert store.granularity == "15m"
    assert [t.name for t in store.parts[0].trends] == ["pkts", "latency"]
    assert store.parts[0].trends[1].time_aggregation == "avg"
    trig = inst.triggers[0]
    # thresholds preserved; descending check order applied at compile
    assert trig.weights == {"warning": 10, "critical": 100}
    assert inst.relations[0].source_col == "cell_id"


def test_relation_rollup_from_yaml(spark, instance_dir):
    """A relation declared in relation/*.yaml drives aggregate_entity
    end-to-end: many-to-many membership rows multiply into each target
    group exactly once per membership."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.plans.instance import (Trend,
                                                         TrendStorePart,
                                                         aggregate_entity)
    from python_minerva_etl_spark.plans.yaml_instance import MinervaInstance

    rel = MinervaInstance.load(instance_dir).relations[0]
    assert (rel.source_col, rel.target_col) == ("cell_id", "site_id")
    # cell 1 belongs to BOTH sites (m:n), cell 2 to site B only
    relation_df = spark.createDataFrame(
        [(1, "siteA"), (1, "siteB"), (2, "siteB")],
        f"{rel.source_col} int, {rel.target_col} string")
    fact = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10.0), (1, "2024-01-01 00:00:00", 20.0),
         (2, "2024-01-01 00:00:00", 5.0)],
        "cell int, ts string, pkts double").withColumn(
            "ts", F.col("ts").cast("timestamp"))
    part = TrendStorePart("main", (Trend("pkts", "double", "sum", "sum"),))
    rolled = aggregate_entity(fact, part, relation_df, rel, "cell", "ts")
    got = {r.cell: (float(r.pkts), r.samples) for r in rolled.collect()}
    assert got == {"siteA": (30.0, 2), "siteB": (35.0, 3)}


def test_trigger_threshold_order_from_yaml(spark, instance_dir):
    """YAML lists thresholds ascending; severity must still resolve by
    highest matching bound."""
    from python_minerva_etl_spark.operators.trigger import evaluate
    from python_minerva_etl_spark.plans.yaml_instance import MinervaInstance

    rule = MinervaInstance.load(instance_dir).triggers[0]
    df = spark.createDataFrame(
        [(1, 5.0), (2, 20.0), (3, 80.0)], "entity bigint, latency double")
    got = {r.entity: r.severity
           for r in evaluate(df, rule, "entity", "ts").collect()}
    assert got == {2: "warning", 3: "critical"}


def _run_cli(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "python_minerva_etl_spark.cli", *args],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_aggregate_time_and_relation(spark, instance_dir):
    """`aggregate`: the declared part (pkts SUM, latency AVG) rolls
    15m -> 1h then up the YAML relation — values follow the
    re-aggregation invariant (sum of sums; avg partials stay sums)."""
    import pyspark.sql.functions as F

    base = os.path.join(SCRATCH, "agg")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    src = os.path.join(base, "src")
    rel = os.path.join(base, "rel")
    tgt = os.path.join(base, "tgt")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10, 4.0),
         (1, "2024-01-01 00:15:00", 20, 6.0),
         (2, "2024-01-01 00:30:00", 5, 2.0),
         (1, "2024-01-01 01:00:00", 7, 1.0)],
        "cell_id int, timestamp string, pkts int, latency double"
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp")
                 ).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(1, "siteA"), (2, "siteA")],
        "cell_id int, site_id string").write.mode("overwrite").parquet(rel)

    out = _run_cli(
        "aggregate", "--instance-dir", instance_dir,
        "--data-source", "vendor", "--part", "main",
        "--source", src, "--target", tgt,
        "--target-granularity", "1h",
        "--relation", "cell_to_site", "--relation-table", rel,
        "--entity-column", "cell_id", "--timestamp-column", "timestamp")
    assert out["rows"] == 2  # siteA x 2 hour buckets
    got = {str(r.cell_id) + "|" + str(r.timestamp):
           (float(r.pkts), float(r.latency), r.samples)
           for r in spark.read.parquet(tgt).collect()}
    # hour 0: pkts 10+20+5, latency partial-sums 4+6+2, samples SUM
    # through the entity stage (3 raw rows) so AVG = 12/3 stays exact
    assert got["siteA|2024-01-01 00:00:00"] == (35.0, 12.0, 3)
    assert got["siteA|2024-01-01 01:00:00"] == (7.0, 1.0, 1)


def test_cli_initialize(instance_dir):
    summary = _run_cli("initialize", instance_dir)
    assert summary["trend_stores"][0]["parts"] == {"main": 2}
    assert summary["triggers"] == ["high_latency"]


def test_cli_load_materialize_notify(instance_dir):
    """The reference's operational loop, end-to-end through the CLI."""
    work = os.path.join(SCRATCH, "flow")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    csv = os.path.join(work, "in.csv")
    with open(csv, "w") as fh:
        fh.write("entity,timestamp,latency\n")
        for i in range(48):
            fh.write(f"cell={i % 4},2024-01-0{1 + i // 24} "
                     f"{i % 24:02d}:00:00,{float(i)}\n")
    store = os.path.join(work, "store")
    r = _run_cli("load-data", "--path", csv, "--target", store)
    assert r["loaded_rows"] == 48
    r = _run_cli("materialize", "--source", store,
                 "--target", os.path.join(work, "mat"),
                 "--state", os.path.join(work, "state"),
                 "--granularity", "1d", "--sum-columns", "latency")
    assert r["recomputed_buckets"] == 2
    r = _run_cli("create-notifications", "--instance-dir", instance_dir,
                 "--trigger", "high_latency", "--source", store,
                 "--target", os.path.join(work, "notifications"))
    assert r["notifications"] > 0


def test_cli_list_queries_and_explain():
    """list-queries enumerates the catalog (no Spark session needed);
    explain prints a physical plan for a declared query."""
    from python_minerva_etl_spark.queries.catalog import all_queries

    out = subprocess.run(
        [sys.executable, "-m", "python_minerva_etl_spark.cli",
         "list-queries"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = [ln.split("\t")[0] for ln in out.stdout.splitlines() if ln]
    assert set(names) == set(all_queries())


def test_cli_validate_check_set(tmp_path, capsys):
    import json as _json
    import os

    from python_minerva_etl_spark.cli import main

    inst = tmp_path / "instance" / "check"
    os.makedirs(inst)
    (inst / "store.yaml").write_text("""
name: region_checks
rules:
  - name: key_nonneg
    predicate: "r_regionkey >= 0"
  - name: key_unique
    unique: [r_regionkey]
  - name: impossible
    predicate: "r_regionkey > 100"
""")
    rc = main(["validate",
               "--instance", str(tmp_path / "instance"),
               "--check", "region_checks",
               "--table", "/root/testdata/sf0.001/region.parquet"])
    out = capsys.readouterr().out.strip().splitlines()
    rep = {r["rule"]: r for r in map(_json.loads, out)}
    assert rc == 1                       # the impossible rule fails
    assert rep["key_nonneg"]["pass"] is True
    assert rep["key_unique"]["pass"] is True
    assert rep["impossible"]["n_violations"] == 5


def test_cli_history_and_restore(spark, tmp_path, capsys):
    import json as _json

    from python_minerva_etl_spark.cli import main
    from python_minerva_etl_spark.storage.snaptable import SnapTable

    t = SnapTable(str(tmp_path / "snap"))
    t.merge(spark, spark.createDataFrame([(1, 1.0, 1)],
                                         "k long, v double, seq int"),
            key=["k"], seq_col="seq")
    t.merge(spark, spark.createDataFrame([(1, 2.0, 2)],
                                         "k long, v double, seq int"),
            key=["k"], seq_col="seq")
    assert main(["history", str(tmp_path / "snap")]) == 0
    hist = [_json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert len(hist) == 2
    assert main(["restore", str(tmp_path / "snap"), "1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out == {"restored_to": 1, "new_version": 3}
    assert {r.v for r in t.read(spark).collect()} == {1.0}


def test_cli_delta_and_iceberg_maintenance(spark, tmp_path, capsys):
    import json as _json

    from python_minerva_etl_spark.cli import main
    from python_minerva_etl_spark.storage.delta import (read_delta,
                                                        write_delta)
    from python_minerva_etl_spark.storage.iceberg import read_iceberg
    from python_minerva_etl_spark.storage.iceberg_write import \
        write_iceberg

    dp = str(tmp_path / "d")
    write_delta(spark, spark.range(0, 30).toDF("id"), dp)
    write_delta(spark, spark.range(30, 60).toDF("id"), dp)
    assert main(["delta", "delete", "--path", dp,
                 "--where", "id < 10"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["delete_version"] == 2
    assert main(["delta", "optimize", "--path", dp]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["optimized_version"] == 3
    assert main(["delta", "changes", "--path", dp,
                 "--start", "2", "--end", "2"]) == 0
    assert "delete" in capsys.readouterr().out
    # vacuum last: it deletes the tombstoned pre-optimize files the
    # v2 change feed still needs
    assert main(["delta", "vacuum", "--path", dp, "--force",
                 "--retention-hours", "0"]) == 0
    assert read_delta(spark, dp).count() == 50

    ip = str(tmp_path / "i")
    write_iceberg(spark, spark.range(0, 20).toDF("id"), ip)
    write_iceberg(spark, spark.range(20, 40).toDF("id"), ip)
    assert main(["iceberg", "compact", "--path", ip]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["replace_snapshot_id"] is not None
    assert main(["iceberg", "expire", "--path", ip]) == 0
    assert read_iceberg(spark, ip).count() == 40


def test_cli_iceberg_equality_delete(spark, tmp_path, capsys):
    import json as _json

    from python_minerva_etl_spark.cli import main
    from python_minerva_etl_spark.storage.iceberg import read_iceberg
    from python_minerva_etl_spark.storage.iceberg_write import \
        write_iceberg

    p = str(tmp_path / "i")
    write_iceberg(spark, spark.range(0, 10).toDF("id"), p)
    assert main(["iceberg", "delete", "--path", p,
                 "--where", "id=3", "--equality"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # blind write: staged-row count is keyed separately; deleted_rows
    # is null so JSON consumers can't misread it as a row count
    assert out == {"deleted_rows": None, "delete_rows_staged": 1,
                   "equality": True}
    assert read_iceberg(spark, p).count() == 9
    # mixed op refuses under --equality
    import pytest as _pytest
    with _pytest.raises(ValueError, match="'=' predicates only"):
        main(["iceberg", "delete", "--path", p,
              "--where", "id<5", "--equality"])


def test_cli_iceberg_compact_policy(spark, tmp_path, capsys):
    import json as _json

    from python_minerva_etl_spark.cli import main
    from python_minerva_etl_spark.storage.iceberg import read_iceberg
    from python_minerva_etl_spark.storage.iceberg_write import \
        write_iceberg

    p = str(tmp_path / "i")
    write_iceberg(spark, spark.range(0, 20).toDF("id"), p)
    assert main(["iceberg", "delete", "--path", p,
                 "--where", "id=3", "--equality"]) == 0
    capsys.readouterr()
    # below threshold: policy declines
    assert main(["iceberg", "compact", "--path", p,
                 "--max-delete-files", "5"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is False
    assert out["stats_before"]["delete_files"] == 1
    # over threshold: policy compacts
    assert main(["iceberg", "compact", "--path", p,
                 "--max-delete-files", "0"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is True
    assert read_iceberg(spark, p).count() == 19
