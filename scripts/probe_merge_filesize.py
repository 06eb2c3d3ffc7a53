#!/usr/bin/env python
"""File-count/size histogram for SnapTable writes under partition
skew, with and without the stats-derived maxRecordsPerFile cap
(r12 verdict item 9, guide §6 output sizing).

Scenario: seed a SnapTable from half the 100x orders replica, then
write the other half funneled through TWO partitions (the "one giant
tenant" skew shape) — through ``append``, which feeds the SAME
``_write_data`` writer the MERGE rewrite uses (the MERGE resolve
aggregate re-shuffles its input, so a skewed incoming batch must be
simulated at the writer).  Without the cap every skewed partition
writes ONE file regardless of size; with the cap (targetFileBytes,
default 128 MB — the probe uses 16 MB so the split is visible at
this corpus size) the oversized partitions split.  A MERGE case at
the same corpus is recorded as the no-skew baseline (AQE-sized
partitions stay under the target with or without the cap).  The
table data is identical either way (asserted row count).

Usage: python scripts/probe_merge_filesize.py [scaled_dir] [--out F]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGET = 16 << 20


def histo(entries) -> dict:
    sizes = sorted(e["bytes"] for e in entries)
    return {"n_files": len(sizes),
            "min_mb": round(sizes[0] / 2**20, 2) if sizes else 0,
            "max_mb": round(sizes[-1] / 2**20, 2) if sizes else 0,
            "median_mb": round(sizes[len(sizes) // 2] / 2**20, 2)
            if sizes else 0,
            "total_mb": round(sum(sizes) / 2**20, 1),
            "files_over_target": sum(1 for s in sizes if s > TARGET)}


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/tmp/sf10"
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from benchgate import contention_gate
    from python_minerva_etl_spark.registry import load_table
    from python_minerva_etl_spark.session import get_spark
    from python_minerva_etl_spark.storage.snaptable import SnapTable

    spark = get_spark(app_name="probe-merge-filesize")
    spark.sparkContext.setLogLevel("ERROR")
    gate = contention_gate(spark)

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    seed = orders.filter("o_orderkey % 2 = 0")
    batch = orders.filter("o_orderkey % 2 = 1").repartition(2)  # skew

    doc = {"probe": "merge_filesize", "scaled": sf_dir,
           "gate": gate["rebaseline_gate"],
           "contended": gate["contended"],
           "target_bytes": TARGET, "cases": {}}
    n_expect = None
    for label, conf, op in (
            ("skewed_append_uncapped", "0", "append"),
            ("skewed_append_capped", str(TARGET), "append"),
            ("merge_uncapped", "0", "merge"),
            ("merge_capped", str(TARGET), "merge")):
        root = tempfile.mkdtemp(prefix="probe_filesize_")
        try:
            spark.conf.set(
                "spark.minerva.snaptable.targetFileBytes", conf)
            tbl = SnapTable(os.path.join(root, "t"))
            tbl.append(spark, seed, ["o_orderkey"])
            v1 = set(e["path"] for e in tbl.files(tbl.latest_version()))
            if op == "append":
                tbl.append(spark, batch, ["o_orderkey"])
            else:
                tbl.merge(spark, batch, ["o_orderkey"], "o_orderkey")
            new = [e for e in tbl.files(tbl.latest_version())
                   if e["path"] not in v1]
            n = tbl.read(spark).count()
            if n_expect is None:
                n_expect = n
            assert n == n_expect, (label, n, n_expect)
            doc["cases"][label] = {"new_files": histo(new),
                                   "rows_total": n}
            print(f"# {label}: {doc['cases'][label]}", file=sys.stderr)
        finally:
            spark.conf.unset("spark.minerva.snaptable.targetFileBytes")
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
