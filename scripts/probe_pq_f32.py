#!/usr/bin/env python
"""PQ ADC float32-accumulator sweep (r12 verdict item 6): the ADC
gather-sum is memory-bandwidth bound (r12 cache-blocking evidence),
so a float32 LUT + accumulator halves its traffic — but it is NOT
bit-preserving, so the declared query keeps the float64 default and
this probe records whether the f32 option closes the gap to the
IVF-indexed large-m winner, plus its agreement with the f64 ranking.

Measures at the scaled corpus, m queries (default 1000, k=5), all in
one gated session, pretrained codebooks (build-once priced out):
pq f64, pq f32, exact Arrow, and recall/agreement of each vs exact.

Usage: python scripts/probe_pq_f32.py [sf_dir] [--m 1000] [--out F]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.corpus_id)
    return out


def _recall(exact, got):
    tot = hit = 0
    for q, s in exact.items():
        tot += len(s)
        hit += len(s & got.get(q, set()))
    return round(hit / tot, 4) if tot else None


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/tmp/sf10"
    m = 1000
    out_path = None
    if "--m" in sys.argv:
        m = int(sys.argv[sys.argv.index("--m") + 1])
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import numpy as np

    from benchgate import contention_gate
    from python_minerva_etl_spark.ext.ann_arrow import (_pq_codebooks_arrow,
                                                        pq_topk_arrow)
    from python_minerva_etl_spark.ext.similarity import brute_force_topk_arrow
    from python_minerva_etl_spark.registry import load_table
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="probe-pq-f32")
    spark.sparkContext.setLogLevel("ERROR")
    gate = contention_gate(spark)

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    q = emb.filter(f"vec_id < {m}")
    k = 5

    t0 = time.perf_counter()
    CB = _pq_codebooks_arrow(emb, 32, 16, 2, "vec_id", "embedding")
    train_sec = round(time.perf_counter() - t0, 2)

    def timed(fn, steady=3):
        fn().collect()  # warm
        samples = []
        last = None
        for _ in range(steady):
            t0 = time.perf_counter()
            last = fn().collect()
            samples.append(time.perf_counter() - t0)
        return (round(statistics.median(samples), 3),
                round(max(samples) - min(samples), 3), last)

    doc = {"probe": "pq_f32_sweep", "scaled": sf_dir,
           "n_corpus": n_corpus, "m": m, "k": k,
           "gate": gate["rebaseline_gate"],
           "contended": gate["contended"],
           "pq_train_sec": train_sec, "paths": {}}

    exact_sec, exact_spr, exact_rows = timed(
        lambda: brute_force_topk_arrow(q, emb, k=k))
    exact_sets = _topk_sets(exact_rows)
    doc["paths"]["exact_arrow"] = {"exec_sec": exact_sec,
                                   "spread": exact_spr}

    f64_sec, f64_spr, f64_rows = timed(
        lambda: pq_topk_arrow(q, emb, k=k, codebooks=CB))
    f64_sets = _topk_sets(f64_rows)
    doc["paths"]["pq_f64"] = {"exec_sec": f64_sec, "spread": f64_spr,
                              "recall_vs_exact":
                                  _recall(exact_sets, f64_sets)}

    f32_sec, f32_spr, f32_rows = timed(
        lambda: pq_topk_arrow(q, emb, k=k, codebooks=CB,
                              adc_dtype=np.float32))
    f32_sets = _topk_sets(f32_rows)
    doc["paths"]["pq_f32"] = {"exec_sec": f32_sec, "spread": f32_spr,
                              "recall_vs_exact":
                                  _recall(exact_sets, f32_sets),
                              "agreement_vs_f64":
                                  _recall(f64_sets, f32_sets)}

    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
