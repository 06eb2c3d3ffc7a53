#!/usr/bin/env python
"""Recall@k artifact for the approximate similarity twins (r10
verdict item 3): the LSH / IVF / PQ / Arrow top-k paths and the
LSH pair-dedup path are rows-only in the driver (approximate by
design); this probe records their quality as a NUMBER against the
exact twin — per-query recall@k for top-k, pair recall for dedup —
at whatever fixture it's pointed at.

Top-k oracle: brute-force cosine (the declared exact baseline).
Pair oracle: cosine_pairs_pivot — the provably-exact pivot-blocked
epsilon-join (same output as the cross join, no cartesian), which is
the only exact form that still runs at the 100x fixture.

Prints one JSON line; merge into SCALE_r{N}_recall.json.

Usage: python scripts/probe_ann_recall.py [sf_dir] [--skip-pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 5


def _topk_sets(df) -> dict:
    """query_id -> set of corpus ids (collects k rows per query —
    bounded output, not corpus data)."""
    out: dict = {}
    for r in df.select("query_id", "corpus_id").collect():
        out.setdefault(r.query_id, set()).add(r.corpus_id)
    return out


def _recall_at_k(exact: dict, approx: dict) -> float:
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    want = sum(len(exact[q]) for q in exact)
    return round(hits / want, 4) if want else 1.0


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_pairs = "--skip-pairs" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from python_minerva_etl_spark.ext.similarity import (
        brute_force_topk, brute_force_topk_arrow, cosine_pairs_lsh,
        cosine_pairs_pivot, ivf_topk, lsh_bucketed_topk, pq_topk)
    from python_minerva_etl_spark.registry import load_table
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="probe-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < 10)

    t0 = time.perf_counter()
    exact = _topk_sets(brute_force_topk(queries, emb, k=K))
    exact_sec = round(time.perf_counter() - t0, 2)

    # identical parameterizations to the declared sim_topk_* queries
    approx_paths = {
        "sim_topk_lsh": lambda: lsh_bucketed_topk(
            queries, emb, k=K, num_planes=4, num_tables=16),
        "sim_topk_ivf": lambda: ivf_topk(
            queries, emb, k=K, num_cells=8, nprobe=4, lloyd_iters=1),
        "sim_topk_pq": lambda: pq_topk(queries, emb, k=K, rerank=50),
        "sim_topk_arrow": lambda: brute_force_topk_arrow(
            queries, emb, k=K),
    }
    topk = {}
    for name, fn in approx_paths.items():
        t0 = time.perf_counter()
        got = _topk_sets(fn())
        topk[name] = {"recall_at_k": _recall_at_k(exact, got),
                      "sec": round(time.perf_counter() - t0, 2)}

    # the IVF recall/cost knob: recall grows with probed cells, cost
    # grows linearly — record the whole curve so the declared query's
    # nprobe=4 figure has its tuning context on the record
    ivf_sweep = {}
    for nprobe in (2, 4, 6, 8):
        t0 = time.perf_counter()
        got = _topk_sets(ivf_topk(queries, emb, k=K, num_cells=8,
                                  nprobe=nprobe, lloyd_iters=1))
        ivf_sweep[nprobe] = {"recall_at_k": _recall_at_k(exact, got),
                             "sec": round(time.perf_counter() - t0, 2)}

    pairs = None
    if not skip_pairs:
        t0 = time.perf_counter()
        want = {(r.id_a, r.id_b) for r in cosine_pairs_pivot(
            emb, threshold=0.4).select("id_a", "id_b").collect()}
        exact_pairs_sec = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        got = {(r.id_a, r.id_b) for r in cosine_pairs_lsh(
            emb, threshold=0.4, num_planes=4, num_tables=16)
            .select("id_a", "id_b").collect()}
        pairs = {
            "exact_pairs": len(want),
            "lsh_pairs": len(got),
            "recall": round(len(want & got) / len(want), 4)
            if want else 1.0,
            "precision": round(len(want & got) / len(got), 4)
            if got else 1.0,
            "exact_sec": exact_pairs_sec,
            "lsh_sec": round(time.perf_counter() - t0, 2),
        }

    print(json.dumps({
        "probe": "ann_recall",
        "sf_dir": sf_dir,
        "corpus_vectors": n_corpus,
        "k": K,
        "n_queries": len(exact),
        "exact_topk_sec": exact_sec,
        "topk": topk,
        "ivf_nprobe_sweep": ivf_sweep,
        "dedup_embedding_lsh_vs_pivot_exact": pairs,
        "params": {"lsh": {"num_planes": 4, "num_tables": 16},
                   "ivf": {"num_cells": 8, "nprobe": 4,
                           "lloyd_iters": 1},
                   "pq": {"rerank": 50},
                   "pair_threshold": 0.4},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
