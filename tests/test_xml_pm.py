"""PM-XML harvest plugin (OP-SRC-PLUGIN): parse both 3GPP result
spellings, then round-trip a fixture through the full load pipeline
into a trend store."""

from __future__ import annotations

import os
import shutil

# space-separated spelling, two measInfo periods, two cells
PM_FILE_A = """<?xml version="1.0"?>
<measCollecFile>
 <measData>
  <measInfo>
   <granPeriod duration="PT900S" endTime="2024-01-01T00:15:00Z"/>
   <measTypes>pkts latency</measTypes>
   <measValue measObjLdn="network=g1,cell=301">
    <measResults>100 4.5</measResults>
   </measValue>
   <measValue measObjLdn="network=g1,cell=302">
    <measResults>200 2.25</measResults>
   </measValue>
  </measInfo>
  <measInfo>
   <granPeriod duration="PT900S" endTime="2024-01-01T00:30:00Z"/>
   <measTypes>pkts latency</measTypes>
   <measValue measObjLdn="network=g1,cell=301">
    <measResults>110 5.5</measResults>
   </measValue>
  </measInfo>
 </measData>
</measCollecFile>
"""

# p-indexed spelling (measType/r), no-attribute measInfo opening tag
PM_FILE_B = """<?xml version="1.0"?>
<measCollecFile>
 <measData>
  <measInfo>
   <granPeriod duration="PT900S" endTime="2024-01-01T00:15:00Z"/>
   <measType p="1">pkts</measType>
   <measType p="2">latency</measType>
   <measValue measObjLdn="network=g2,cell=401">
    <r p="1">300</r>
    <r p="2">1.5</r>
   </measValue>
  </measInfo>
 </measData>
</measCollecFile>
"""


def _write_fixture(scratch: str) -> str:
    d = os.path.join(scratch, "pm_xml")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for name, text in (("a.xml", PM_FILE_A), ("b.xml", PM_FILE_B)):
        with open(os.path.join(d, name), "w") as fh:
            fh.write(text)
    return d


def test_parse_pm_long(spark, tmp_path):
    from python_minerva_etl_spark.sources.xml_pm import parse_pm_long

    d = _write_fixture(str(tmp_path))
    rows = {(r.dn, str(r.timestamp), r.trend): r.value_str
            for r in parse_pm_long(spark, d).collect()}
    assert rows[("network=g1,cell=301", "2024-01-01 00:15:00", "pkts")] == "100"
    assert rows[("network=g1,cell=301", "2024-01-01 00:30:00", "latency")] == "5.5"
    assert rows[("network=g2,cell=401", "2024-01-01 00:15:00", "pkts")] == "300"
    assert len(rows) == 8  # 4 measValues x 2 trends


def test_parse_pm_wide_types(spark, tmp_path):
    from python_minerva_etl_spark.sources.xml_pm import parse_pm

    d = _write_fixture(str(tmp_path))
    wide = parse_pm(spark, d)
    assert set(wide.columns) == {"dn", "timestamp", "pkts", "latency"}
    types = dict(wide.dtypes)
    assert types["pkts"] == "smallint"    # integral strings walk the lattice
    assert types["latency"] == "double"
    got = {(r.dn, str(r.timestamp)): (r.pkts, r.latency)
           for r in wide.collect()}
    assert got[("network=g1,cell=302", "2024-01-01 00:15:00")] == (200, 2.25)
    assert got[("network=g2,cell=401", "2024-01-01 00:15:00")] == (300, 1.5)


def test_pm_load_roundtrip_to_trend_store(spark, tmp_path):
    """xml-pm plugin -> load_data -> time-partitioned trend store:
    the reference's harvest-to-store path for its signature format."""
    from python_minerva_etl_spark.plans.load import load_data

    d = _write_fixture(str(tmp_path))
    store = os.path.join(str(tmp_path), "pm_store")
    shutil.rmtree(store, ignore_errors=True)
    back = load_data(spark, "xml-pm", d, store, granularity="1d")
    assert back.count() == 4
    assert "entity_key" in back.columns
    one = back.filter("dn = 'network=g1,cell=301' "
                      "AND timestamp = TIMESTAMP '2024-01-01 00:30:00'")
    assert [(r.pkts, r.latency) for r in one.collect()] == [(110, 5.5)]
    # partition layout: one __bucket=YYYY-MM-DD dir per day
    assert any(p.startswith("__bucket=2024-01-01")
               for p in os.listdir(store))


def test_telemetry_pipeline_example_runs(spark, tmp_path):
    """The end-to-end telemetry example stays runnable: harvest →
    upsert-idempotent load → 15m/1h/1d chain → entity rollup →
    trigger → storm collapse → staleness."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "telemetry_pipeline.py")
    spec = importlib.util.spec_from_file_location("telemetry_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    c = mod.run(spark, str(tmp_path))
    # 2 nets x 2 cells x 8 periods, loaded twice but upsert-keyed
    assert c["store_rows"] == 32
    assert c["hourly_rows"] == 12     # 4 entities x 3 hour buckets
    assert c["daily_rows"] == 4       # 4 entities x 1 day
    # re-agg algebra: daily samples = raw rows (8), not hourly buckets
    assert (c["daily_samples_per_entity"].mn
            == c["daily_samples_per_entity"].mx == 8)
    assert c["network_rows"] == 6     # 2 networks x 3 hour buckets
    # g1/cell1: hour-1 avg (4.5+95*3)/4 = 72.375 -> warning,
    # hour-2 avg 95 -> critical
    assert c["notifications"] == 2
    assert c["storms"] == 1           # 60-min gap < 90-min cooldown
    assert c["stale_entities"] == 0
