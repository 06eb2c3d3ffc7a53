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

# a probe pass whose spread exceeds this fraction of its median was
# measured through a load transient; it earns one gate-and-retry
# (kept only if the retry's own spread is quiet) — bench.py discipline
NOISY_FRAC, NOISY_FLOOR = 0.3, 0.2


def _measure_once(q, spark, sf_dir, warmups):
    def force():
        q.spark(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
    for _ in range(warmups):
        force()
    samples = []
    for _ in range(MEASURED):
        t0 = time.perf_counter()
        force()
        samples.append(time.perf_counter() - t0)
    return (round(statistics.median(samples), 3),
            round(max(samples) - min(samples), 3))


def measure(q, spark, sf_dir):
    med, spr = _measure_once(q, spark, sf_dir, WARMUP)
    if spr > max(NOISY_FRAC * med, NOISY_FLOOR):
        # bench.py r12 discipline: a fixed settle cannot outlast the
        # multi-minute steal waves this box sees — wait behind the
        # retry-until-quiet rebaseline gate before the re-measure
        from benchgate import contention_gate
        contention_gate(spark)
        med2, spr2 = _measure_once(q, spark, sf_dir, 0)
        if spr2 <= max(NOISY_FRAC * med2, NOISY_FLOOR):
            return med2, spr2
    return med, spr


# the default probe set: the most expensive headline rows of the
# last bench round — the plans whose scale exponents matter most
TOP5 = ["cdc_incremental_agg", "upsert_merge_table", "rollup_entity",
        "dedup_simhash", "avro_ingest"]


def main() -> None:
    """``python scripts/scale_probe.py [--json OUT] [--k K]
    [scaled_dir] [query ...]`` — with ``--json`` also writes the
    round artifact (r8 verdict #8: SCALE_r{N}.json, exponents
    tracked like bench times).  ``K`` is the scaled fixture's
    replica factor (default 10, /tmp/sf1's)."""
    import json
    import math

    args = sys.argv[1:]
    json_out = None
    k = 10.0
    while args and args[0].startswith("--"):
        if args[0] == "--json":
            json_out = args[1]
            args = args[2:]
        elif args[0] == "--k":
            k = float(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    scaled = args[0] if args else "/tmp/sf1"
    names = args[1:] or TOP5
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from python_minerva_etl_spark.queries.catalog import all_queries
    from python_minerva_etl_spark.session import get_spark

    from benchgate import contention_gate

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # r11 verdict item 7: the SCALE artifacts carried probe noise
    # because only bench.py gated — the probes now refuse a loaded box
    # the same way and embed their own gate evidence.
    gate = contention_gate(spark)
    print(f"# gate: {gate}", flush=True)
    rows = {}
    print("| query | base median (spread) | scaled median (spread) | "
          "ratio | exp |")
    print("|---|---|---|---|---|")
    for name in names:
        q = queries[name]
        bm, bs = measure(q, spark, base)
        sm, ss = measure(q, spark, scaled)
        ratio = round(sm / bm, 3)
        # time ~ rows^exp: exp = log(ratio)/log(K); < 1 means
        # sub-linear (fixed costs amortize), > 1 is a plan smell
        exp = round(math.log(max(ratio, 1e-9)) / math.log(k), 3)
        rows[name] = {"base_sec": bm, "base_spread": bs,
                      "scaled_sec": sm, "scaled_spread": ss,
                      "ratio": ratio, "exp": exp}
        print(f"| {name} | {bm} ({bs}) | {sm} ({ss}) | "
              f"{ratio}x | {exp} |", flush=True)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"metric": "scale_probe", "k": k,
                       "base": base, "scaled": scaled,
                       "rebaseline_gate": gate["rebaseline_gate"],
                       "contended": gate["contended"],
                       "queries": rows}, fh, indent=1)
        print(f"wrote {json_out}")
    spark.stop()


if __name__ == "__main__":
    main()
