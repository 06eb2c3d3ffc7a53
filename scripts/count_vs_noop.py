#!/usr/bin/env python
"""Round-6 bench forensics (round-5 verdict items "What's wrong" #1/#2):

1. Per-query count-forced vs noop-forced pair, ONE session, for the
   four read-path queries whose driver-bench r4->r5 deltas exceeded
   their reported spreads: win_moving_avg, join_asof, rollup_entity,
   agg_reagg_avg.  If noop ~= the r5 driver figure and count ~= the
   r4 driver figure, the delta is the forcing re-base, not a plan
   regression.

2. An environment-sanity probe bracketing the MERGE queries: a fixed
   raw-filesystem benchmark (write+fsync+read of a 256 MiB file under
   the same tmp root the MERGE tables use) run before and after, so a
   driver-environment divergence (page cache, fs throughput) is
   visible in the numbers rather than assumed.

Usage: python scripts/count_vs_noop.py  (prints a markdown table)
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FOUR = ["win_moving_avg", "join_asof", "rollup_entity", "agg_reagg_avg"]
MERGE = ["upsert_merge_table", "cdc_incremental_agg"]
WARMUP, MEASURED = 2, 3


def measure(mk_df, force) -> tuple[float, float]:
    for _ in range(WARMUP):
        force(mk_df())
    samples = []
    for _ in range(MEASURED):
        t0 = time.perf_counter()
        force(mk_df())
        samples.append(time.perf_counter() - t0)
    return (round(statistics.median(samples), 4),
            round(max(samples) - min(samples), 4))


def fs_probe(mb: int = 256) -> dict:
    """Raw local-fs throughput: sequential write+fsync then read of a
    fresh file (so the read is page-cache-warm, like Spark shuffle
    files are)."""
    blob = os.urandom(1 << 20)
    with tempfile.NamedTemporaryFile(dir=tempfile.gettempdir(),
                                     delete=False) as fh:
        path = fh.name
        t0 = time.perf_counter()
        for _ in range(mb):
            fh.write(blob)
        fh.flush()
        os.fsync(fh.fileno())
        t_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    with open(path, "rb") as fh:
        while fh.read(1 << 22):
            pass
    t_read = time.perf_counter() - t0
    os.remove(path)
    return {"write_MBps": round(mb / t_write, 1),
            "read_MBps": round(mb / t_read, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from python_minerva_etl_spark.queries.catalog import all_queries
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="count-vs-noop")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def by_count(df):
        df.count()

    def by_noop(df):
        df.write.format("noop").mode("overwrite").save()

    print("| query | count median (spread) | noop median (spread) | "
          "noop/count |")
    print("|---|---|---|---|")
    for name in FOUR:
        q = queries[name]
        cm, cs = measure(lambda: q.spark(spark, sf_dir), by_count)
        nm, ns = measure(lambda: q.spark(spark, sf_dir), by_noop)
        print(f"| {name} | {cm} ({cs}) | {nm} ({ns}) | "
              f"{round(nm / cm, 2)}x |")

    pre = fs_probe()
    print()
    print(f"fs probe BEFORE merge queries: {pre}")
    for name in MERGE:
        q = queries[name]
        m, s = measure(lambda: q.spark(spark, sf_dir), by_noop)
        print(f"| {name} | noop {m} ({s}) |")
    post = fs_probe()
    print(f"fs probe AFTER merge queries:  {post}")
    spark.stop()


if __name__ == "__main__":
    main()
