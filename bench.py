#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...}

Each query runs the full plan to completion (count() — forces every
exchange/agg but keeps driver collection out of the measurement).
A warmup query amortizes session/JIT startup so the numbers reflect
steady-state executor throughput, which is what extrapolates to a
cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# The headline set: the Minerva core path (time agg chain, entity
# rollup, windows, as-of, trigger, sessionize, upsert) plus the
# scale-critical extensions (dedup LSH, similarity, text stats).
#
# Round 4 adds the snapshot-table write path (MERGE + CDC-maintained
# aggregate) — ~2 s each at sf0.1, reflected in the total; rounds 1-3
# benched 17 read-path queries, so compare per-query numbers (or the
# 17-query subtotal in PERF.md) across rounds, not raw totals.
HEADLINE = [
    "agg_time_1h",
    "agg_time_1d",
    "agg_reagg_avg",
    "rollup_entity",
    "join_inner",
    "join_asof",
    "attr_compact",
    "win_moving_avg",
    "topk_worst",
    "trigger_threshold",
    "events_sessionize",
    "upsert_last_wins",
    "upsert_merge_table",
    "cdc_incremental_agg",
    "dedup_exact",
    "dedup_simhash",
    "sim_topk",
    "text_token_stats",
    "text_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from python_minerva_etl_spark.queries.catalog import all_queries
    from python_minerva_etl_spark.session import get_spark

    # session defaults (2×cores shuffle partitions + AQE coalescing)
    # measured fastest across the headline set — narrower partition
    # counts help the small shuffles but hurt the explode-heavy dedup
    # plans more.
    spark = get_spark(app_name="minerva-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warmup + measure per query: two warmup runs immediately followed
    # by the measured run.  Spark's generated-class cache holds only 100
    # entries per JVM; 17 headline plans x several codegen stages each
    # overflow it, so a full warmup PASS followed by a full measure pass
    # re-JITs half the plans (measured: +2.3 s on dedup_simhash alone).
    # Per-query warm measurement reflects steady-state executor
    # throughput — on a real cluster each of these plans runs
    # continuously, not round-robin with 16 strangers in one JVM.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = queries[name]
        for _ in range(2):
            q.spark(spark, sf_dir).count()
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_query_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
