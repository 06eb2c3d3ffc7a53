#!/usr/bin/env python
"""Measure rollup_entity vs rollup_entity_bucketed at the scaled
fixture UNDER THE SORT-MERGE REGIME.

Why this probe exists: at /tmp/sf10 the session's 64 MB broadcast
threshold lets the planner broadcast the orders side, so BOTH
variants run broadcast joins and the bucketed layout is irrelevant —
measured parity (12.4 vs 12.8 s ± >1) is the EXPECTED result there,
not a verdict on bucketing.  A 100 TB rollup's fact-fact join side
never fits a broadcast; its regime is sort-merge.  This probe lowers
``spark.sql.autoBroadcastJoinThreshold`` to 8 MB (facts too big to
broadcast, dims still broadcast — the cluster shape) and times both
variants noop-forced, gated, 1 warmup + 3 measured.  The declared
queries themselves are UNCHANGED — this is a regime simulation in a
bespoke session, the same queries the oracle verifies.

Usage: python scripts/probe_bucketed_regime.py [scaled_dir] [--out F]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARMUP, MEASURED = 1, 5


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/tmp/sf10"
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from benchgate import contention_gate
    from python_minerva_etl_spark.queries.catalog import all_queries
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(
        app_name="probe-bucketed-regime",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold":
                    str(8 << 20)})
    spark.sparkContext.setLogLevel("ERROR")
    gate = contention_gate(spark)

    qs = all_queries()

    def join_inner_nohint(spark_, sf_):
        """join_inner WITHOUT its broadcast hint — the plan the
        cluster regime actually runs when the customer side outgrows
        the broadcast threshold (the declared query's hint pins BHJ
        at any size, which at 100 TB is an OOM, not a plan).  Probe
        yardstick only; the declared query is unchanged."""
        from pyspark.sql import functions as F

        from python_minerva_etl_spark.registry import load_table
        orders = load_table(spark_, sf_, "orders")
        cust = load_table(spark_, sf_, "customer")
        return (orders.join(cust, orders.o_custkey == cust.c_custkey,
                            "inner")
                .groupBy("c_mktsegment")
                .agg(F.count("*").alias("n_orders"),
                     F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
                     .cast("double").alias("sum_price")))

    class _Synth:
        def __init__(self, fn):
            self.spark = fn

    # rollup pair: 8 MB threshold (facts too big to broadcast, dims
    # still broadcast — the r12 cluster-shape comparison, unchanged).
    # join_inner pair: broadcast DISABLED — the 100x customer replica
    # still compresses under 8 MB, but the cluster regime this twin
    # exists for is "customer outgrew every broadcast", so the probe
    # simulates exactly that (threshold is a runtime conf).
    probe_set = [
        ("rollup_entity", qs["rollup_entity"], str(8 << 20)),
        ("rollup_entity_bucketed", qs["rollup_entity_bucketed"],
         str(8 << 20)),
        ("join_inner_nohint_smj", _Synth(join_inner_nohint), "-1"),
        ("join_inner_bucketed", qs["join_inner_bucketed"], "-1"),
    ]
    doc: dict = {"probe": "bucketed_rollup_smj_regime",
                 "scaled": sf_dir, "gate": gate,
                 "autoBroadcastJoinThreshold":
                     {"rollup_pair": "8m", "join_pair": "-1"},
                 "queries": {}}
    for name, q, thresh in probe_set:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sparkContext.setJobDescription(f"smj-regime: {name}")

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
        med = round(statistics.median(samples), 3)
        spr = round(max(samples) - min(samples), 3)
        # plan shape evidence under this regime
        import contextlib
        import io
        import re
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.spark(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        doc["queries"][name] = {
            "median_sec": med, "spread": spr, "samples":
                [round(s, 3) for s in samples],
            "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
            "broadcast_joins": len(re.findall(r"BroadcastHashJoin",
                                              plan)),
            "shuffle_exchanges": len(re.findall(
                r"\(\d+\) Exchange\b", plan)),
        }
        print(f"# {name}: {med}s ±{spr}  "
              f"SMJ={doc['queries'][name]['sort_merge_joins']} "
              f"shuffles={doc['queries'][name]['shuffle_exchanges']}",
              file=sys.stderr)

    line = json.dumps(doc)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
