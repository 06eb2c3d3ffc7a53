#!/usr/bin/env python
"""Codegen-cache budget probe (r10 verdict item 8).

Spark's generated-class cache holds ``spark.sql.codegen.cache
.maxEntries`` (default 100) compiled classes per JVM.  The 23-query
headline set compiles several codegen stages per plan, so a
round-robin pass over the set overflows the cache and later sweeps
re-JIT plans that already ran — steady-state bench figures then
include recompilation that a real deployment (each plan running
continuously on its own executors) never pays.

This probe runs the same round-robin sweeps twice in fresh JVMs —
once at the default 100 entries, once at 4096 (no eviction) — and
reports per-sweep totals.  sweep0 pays full JIT in both; the
sweep1+/sweep0 recovery gap between the two settings is the cache
thrash attributable to the bench harness itself.

Usage: python scripts/probe_codegen_cache.py [sf_dir]
Prints one JSON line; findings go to PERF.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SWEEPS = 3


def _child(sf_dir: str, max_entries: int) -> None:
    from python_minerva_etl_spark.queries.catalog import all_queries
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name=f"probe-codegen-{max_entries}",
                      extra_conf={
                          "spark.sql.codegen.cache.maxEntries":
                          str(max_entries)})
    spark.sparkContext.setLogLevel("ERROR")
    import bench  # HEADLINE + noop forcing

    queries = all_queries()
    sweeps = []
    per_query_last = {}
    for s in range(SWEEPS):
        t_sweep = 0.0
        for name in bench.HEADLINE:
            t0 = time.perf_counter()
            bench._force(queries[name].spark(spark, sf_dir))
            dt = time.perf_counter() - t0
            t_sweep += dt
            per_query_last[name] = round(dt, 4)
        sweeps.append(round(t_sweep, 3))
    print(json.dumps({"max_entries": max_entries, "sweeps": sweeps,
                      "last_sweep_queries": per_query_last}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(sys.argv[3], int(sys.argv[2]))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results = []
    for max_entries in (100, 4096):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(max_entries), sf_dir],
            capture_output=True, text=True, check=True)
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    r100, rbig = results
    print(json.dumps({
        "probe": "codegen_cache_budget",
        "sf_dir": sf_dir,
        "headline_queries": len(r100["last_sweep_queries"]),
        "sweeps_default_100": r100["sweeps"],
        "sweeps_max_4096": rbig["sweeps"],
        # steady-state round-robin cost attributable to eviction:
        # the gap between the two settings' post-JIT sweeps
        "steady_state_gap_sec": round(
            min(r100["sweeps"][1:]) - min(rbig["sweeps"][1:]), 3),
        "per_query_last_default": r100["last_sweep_queries"],
        "per_query_last_big": rbig["last_sweep_queries"],
    }))


if __name__ == "__main__":
    main()
