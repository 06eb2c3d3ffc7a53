#!/usr/bin/env python
"""100x scaling probe (round-5 verdict item 6): measure the most
shuffle-heavy headline plans at sf0.1 and at a K-replica fixture
(built by make_scaled_fixture.py), noop-forced, 1 warmup + 3 measured
passes, median + spread — the same discipline as bench.py.

Usage: python scripts/scale_probe.py [scaled_dir] [query ...]
Defaults: /tmp/sf10 dedup_simhash rollup_entity cdc_incremental_agg
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARMUP, MEASURED = 1, 3


def measure(q, spark, sf_dir):
    def force():
        q.spark(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
    for _ in range(WARMUP):
        force()
    samples = []
    for _ in range(MEASURED):
        t0 = time.perf_counter()
        force()
        samples.append(time.perf_counter() - t0)
    return (round(statistics.median(samples), 3),
            round(max(samples) - min(samples), 3))


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    names = sys.argv[2:] or ["dedup_simhash", "rollup_entity",
                             "cdc_incremental_agg"]
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from python_minerva_etl_spark.queries.catalog import all_queries
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    print("| query | base median (spread) | scaled median (spread) | "
          "ratio |")
    print("|---|---|---|---|")
    for name in names:
        q = queries[name]
        bm, bs = measure(q, spark, base)
        sm, ss = measure(q, spark, scaled)
        print(f"| {name} | {bm} ({bs}) | {sm} ({ss}) | "
              f"{round(sm / bm, 2)}x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
