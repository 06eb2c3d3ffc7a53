#!/usr/bin/env python
"""Incremental-dedup state growth probe (r10 verdict item 6).

Threads the documents table through N id-ordered ingest batches,
compacting state between batches, and records per-batch accepted
rows, state rows, and estimated state bytes — evidence that the
signature store grows with the ACCEPTED corpus (bounded by policy
via the retention horizon), not with ingest traffic.

Prints one JSON line; merge into the round's SCALE artifact.

Usage: python scripts/probe_incremental_state.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import functions as F

    from python_minerva_etl_spark.ext.incremental_dedup import (
        compact_state, incremental_dedup)
    from python_minerva_etl_spark.registry import load_table
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="probe-incremental-state",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    lo, hi = (docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0])
    total = docs.count()
    step = (hi - lo + 1 + n_batches - 1) // n_batches

    num_hashes = 64
    sig_bytes = 8 * num_hashes + 8  # array<long> payload + doc id

    state = None
    batches = []
    accepted_total = 0
    for b in range(n_batches):
        b_lo, b_hi = lo + b * step, lo + (b + 1) * step
        batch = docs.filter((F.col("doc_id") >= b_lo)
                            & (F.col("doc_id") < b_hi))
        ingested = batch.count()
        acc, state = incremental_dedup(state, batch, threshold=0.9,
                                       num_hashes=num_hashes)
        # persist state between ingests exactly like a real pipeline
        # (also keeps each iteration's lineage from stacking)
        state_path = os.path.join(REPO, ".scratch",
                                  f"inc_dedup_state_b{b}")
        compact_state(state).write.mode("overwrite").parquet(state_path)
        state = spark.read.parquet(state_path)
        n_acc, n_state = acc.count(), state.count()
        accepted_total += n_acc
        batches.append({"batch": b, "ingested": ingested,
                        "accepted": n_acc, "state_rows": n_state,
                        "state_est_bytes": n_state * sig_bytes})
    # retention horizon: keep only the top half of ids
    horizon = lo + (hi - lo) // 2
    retained = compact_state(state, retain_min_doc=horizon).count()

    print(json.dumps({
        "probe": "incremental_dedup_state",
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "num_hashes": num_hashes,
        "docs_total": total,
        "accepted_total": accepted_total,
        "batches": batches,
        "state_rows_final": batches[-1]["state_rows"],
        "state_rows_after_horizon": retained,
        "horizon_min_doc": horizon,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
