#!/usr/bin/env python
"""Keep-set recall study for incremental_dedup's ``batch_neighborhood``
bound (r11 verdict item 6).

The r11 evidence for the bound was exact-dup cliques (identical keep
set, 4x faster).  The open question was the trade on LOOSELY-connected
near-cliques: the W-chain checks each doc only against its W id-order
predecessors per (band, bucket), so a true match whose partner sits
further back in the bucket's id order is missed — the doc is kept
(dedup recall loss, never a false drop).

Fixture: built from the documents table — each base doc spawns a
GRADED near-dup chain (variant v keeps a shrinking prefix of the base
tokens and appends v unique filler tokens), so Jaccard decays with
|v - v'| and only nearby variants verify at the threshold: a
chain-connected near-clique, not an exact clique.  Two id orders per
corpus:

- ``grouped``: variants of a base doc get adjacent ids (the natural
  ingest order for crawl shards);
- ``interleaved``: round-robin ids across groups (the adversarial
  order — chain neighbors are maximally distant in id).

For each order: keep-set size and drop-recall vs the full bucket
self-join, for W in the sweep, plus wall time on a clique-heavy
timing batch.  Prints one JSON line; merge into SCALE_r{N}_*.json.

Usage: python scripts/probe_batch_neighborhood.py [sf_dir]
       [--out FILE] [--w 2,4,8]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    argv = sys.argv[1:]
    out_path = None
    ws = [2, 4, 8]
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out_path = argv[i + 1]
            i += 2
        elif argv[i] == "--w":
            ws = [int(x) for x in argv[i + 1].split(",")]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from benchgate import contention_gate
    from python_minerva_etl_spark.ext.incremental_dedup import \
        incremental_dedup
    from python_minerva_etl_spark.registry import load_table
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="probe-batch-neighborhood")
    spark.sparkContext.setLogLevel("ERROR")
    gate = contention_gate(spark)

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").orderBy("doc_id").limit(200)
            .collect())
    n_groups, n_var = len(docs), 8

    def variants(text: str):
        toks = text.split()
        if len(toks) < 2 * n_var:
            toks = (toks * ((2 * n_var // max(len(toks), 1)) + 1))
        out = []
        keep = len(toks)
        for v in range(n_var):
            kept = toks[:max(keep - v * max(keep // 12, 1), 4)]
            filler = [f"zz{v}x{j}" for j in range(v * 2)]
            out.append(" ".join(kept + filler))
        return out

    grouped, interleaved = [], []
    for g, r in enumerate(docs):
        for v, t in enumerate(variants(r.text)):
            grouped.append((g * n_var + v, t))
            interleaved.append((v * n_groups + g, t))

    def run(rows, **kwargs):
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        t0 = time.perf_counter()
        accepted, _state = incremental_dedup(None, batch, **kwargs)
        kept = {r.doc_id for r in accepted.select("doc_id").collect()}
        return kept, round(time.perf_counter() - t0, 2)

    results: dict = {}
    for order, rows in (("grouped", grouped),
                        ("interleaved", interleaved)):
        full_kept, full_sec = run(rows)
        n_total = len(rows)
        full_dropped = n_total - len(full_kept)
        entry = {"total_docs": n_total,
                 "full_join": {"kept": len(full_kept),
                               "dropped": full_dropped,
                               "sec": full_sec}}
        for w in ws:
            kept, sec = run(rows, batch_neighborhood=w)
            extra_kept = len(kept - full_kept)
            assert full_kept <= kept, "chain dropped a doc full-join kept"
            entry[f"W={w}"] = {
                "kept": len(kept),
                "extra_kept_vs_full": extra_kept,
                "drop_recall_vs_full":
                    round((full_dropped - extra_kept) / full_dropped, 4)
                    if full_dropped else 1.0,
                "sec": sec}
        results[order] = entry
        print(f"# {order}: {entry}", file=sys.stderr)

    # timing batch: one deep exact clique (the case the bound exists
    # for) — 2,000 copies of one doc in a 3,000-doc batch
    base = docs[0].text
    clique_rows = [(i, base) for i in range(2000)] + [
        (2000 + i, docs[(i % (len(docs) - 1)) + 1].text + f" u{i}")
        for i in range(1000)]
    _, full_clique_sec = run(clique_rows)
    _, w_clique_sec = run(clique_rows, batch_neighborhood=ws[0])

    doc = {
        "probe": "batch_neighborhood_recall",
        "sf_dir": sf_dir,
        "gate": gate,
        "note": (
            "drop_recall_vs_full = fraction of the full join's drops"
            " the W-chain also drops (1.0 = identical keep set)."
            " extra_kept docs are FALSE KEEPS (missed dups), never"
            " false drops (asserted).  The graded near-clique decays"
            " Jaccard with variant distance, so only nearby variants"
            " verify — the structure that stresses the chain."),
        "orders": results,
        "clique_timing_batch": {
            "docs": len(clique_rows), "clique_size": 2000,
            "full_join_sec": full_clique_sec,
            f"W={ws[0]}_sec": w_clique_sec},
    }
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
