"""Salted aggregation: bit-identical to unsalted on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_minerva_etl_spark.operators.skew import salted_agg
from python_minerva_etl_spark.registry import load_table


def test_salted_agg_equals_plain(spark):
    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    # make user 1 pathologically hot (unioned copies of its rows)
    hot = ev.filter(F.col("user_id") == 1)
    skewed = ev.union(hot).union(hot).union(hot)

    aggs = {
        "samples": (F.count("*"), F.sum("samples")),
        "sum_value": (F.sum(F.col("value").cast("decimal(28,4)")),
                      F.sum("sum_value")),
        "max_value": (F.max("value"), F.max("max_value")),
    }
    salted = salted_agg(skewed, ["user_id"], 32, aggs).withColumn(
        "sum_value", F.col("sum_value").cast("double"))
    plain = (skewed.groupBy("user_id")
             .agg(F.count("*").alias("samples"),
                  F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                  .alias("sum_value"),
                  F.max("value").alias("max_value")))

    a = {r.user_id: (r.samples, r.sum_value, r.max_value)
         for r in salted.collect()}
    b = {r.user_id: (r.samples, r.sum_value, r.max_value)
         for r in plain.collect()}
    assert a == b  # exact, including the decimal-summed doubles


def test_directory_dn_roundtrip(spark):
    from python_minerva_etl_spark import directory as D

    assert D.entity_type_of("network=g1,cell=301") == "cell"
    assert D.build_dn(("network", "g1"), ("cell", "3")) == "network=g1,cell=3"

    df = spark.createDataFrame(
        [("network=g1,cell=301",), ("network=g2,node=17",)], "dn string")
    got = df.select(
        D.dn_component("dn", "network").alias("net"),
        D.dn_entity_type("dn").alias("etype"),
        D.entity_key("dn").alias("key")).collect()
    assert [r.net for r in got] == ["g1", "g2"]
    assert [r.etype for r in got] == ["cell", "node"]
    assert len({r.key for r in got}) == 2 and all(len(r.key) == 32 for r in got)


def test_directory_resolve_create_if_missing(spark):
    from python_minerva_etl_spark import directory as D

    registry = spark.createDataFrame(
        [("network=g1,cell=1", "known-key-1")], "dn string, entity_key string")
    facts = spark.createDataFrame(
        [("network=g1,cell=1", 10.0), ("network=g1,cell=2", 20.0)],
        "dn string, value double")
    out = {r.dn: r.entity_key
           for r in D.resolve(facts, registry).collect()}
    assert out["network=g1,cell=1"] == "known-key-1"       # existing id kept
    assert len(out["network=g1,cell=2"]) == 32             # new content id


def test_directory_registry_aliases_tags(spark):
    """§1.1 entity registry: aliases array + tags map (OP-F-MAP in
    service of the directory model)."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark import directory as D

    dns = spark.createDataFrame(
        [("network=g1,cell=301",), ("network=g2,node=17",)], "dn string")
    reg = D.build_registry(dns)
    rows = {r.dn: r for r in reg.collect()}
    r1 = rows["network=g1,cell=301"]
    assert r1.entity_type == "cell"
    assert set(r1.aliases) == {"g1", "301", "network=g1,cell=301"}
    assert r1.tags == {"network": "g1", "cell": "301"}
    # map access + alias lookup
    nets = reg.select(F.element_at("tags", "network").alias("net")).collect()
    assert {r.net for r in nets} == {"g1", "g2"}
    assert D.lookup_by_alias(reg, "301").count() == 1
    assert D.lookup_by_alias(reg, "network=g2,node=17").count() == 1
    assert D.lookup_by_alias(reg, "nope").count() == 0


def test_directory_registry_edge_cases(spark):
    """Repeated component types (no map crash, last wins), '=' inside
    values (first-'=' split), duplicate input DNs (deduped)."""
    from python_minerva_etl_spark import directory as D

    dns = spark.createDataFrame(
        [("network=g1,node=2,node=7",),
         ("network=g1,desc=a=b",),
         ("network=g1,desc=a=b",)], "dn string")  # dup input row
    reg = D.build_registry(dns)
    rows = {r.dn: r for r in reg.collect()}
    assert len(rows) == 2  # input deduped
    hier = rows["network=g1,node=2,node=7"]
    assert hier.tags == {"network": "g1", "node": "7"}  # last wins
    assert {"2", "7"} <= set(hier.aliases)  # both values remain aliases
    eq = rows["network=g1,desc=a=b"]
    assert eq.tags["desc"] == "a=b"  # split on first '=' only
    assert "a=b" in eq.aliases


def test_salted_join_equals_plain(spark):
    from python_minerva_etl_spark.operators.skew import salted_join

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    cust = (load_table(spark, "/root/testdata/sf0.01", "customer")
            .select(F.col("c_custkey").alias("user_id"), "c_nationkey"))
    # hot key: user 1 tripled
    hot = ev.filter(F.col("user_id") == 1)
    skewed = ev.union(hot).union(hot)

    salted = salted_join(skewed, cust, ["user_id"], 8, "event_id")
    plain = skewed.join(cust, "user_id")
    key = lambda r: (r.user_id, r.event_id, r.c_nationkey)
    assert sorted(map(key, salted.collect())) == \
        sorted(map(key, plain.collect()))
    # every salt bucket actually used (the fan-out is real)
    n_salts = (skewed.select(
        (F.pmod(F.xxhash64("event_id"), F.lit(8))).alias("s"))
        .distinct().count())
    assert n_salts == 8
