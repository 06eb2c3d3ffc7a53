#!/usr/bin/env python
"""Synthesize a scaled-up fixture from an existing sf directory by
unioning K key-offset replicas of every table — used for the scaling
headroom check (PERF.md): measure the headline bench at sf0.1 and at
a 10x replica and compare seconds/row.

Key consistency: all foreign keys shift by the same per-replica
offset, so join cardinalities scale linearly (each replica joins only
within itself, like a well-partitioned larger corpus).  Document text
gets a per-replica suffix token so the 10x corpus is not one giant
exact-duplicate clique.  Dims that facts reference (customer /
supplier / part) scale with the facts; region/nation stay fixed.

Usage: python scripts/make_scaled_fixture.py [--tables a,b] [K] [src_sf_dir] [dst]
Defaults: 10 /root/testdata/sf0.1 /tmp/sf1
"""

from __future__ import annotations

import os
import sys
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    argv = list(sys.argv[1:])
    only = None
    if "--tables" in argv:
        i = argv.index("--tables")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    k = int(argv[0]) if len(argv) > 0 else 10
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    dst = argv[2] if len(argv) > 2 else "/tmp/sf1"

    from pyspark.sql import functions as F

    from python_minerva_etl_spark.registry import TABLES, load_table
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="make-scaled-fixture")
    spark.sparkContext.setLogLevel("ERROR")

    # per-table key columns to offset: (table, [key cols])
    offsets = {
        "region": [],
        "nation": [],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    # one offset unit per key DOMAIN so FKs stay consistent
    domains = {
        "c_custkey": "cust", "o_custkey": "cust",
        "o_orderkey": "ord", "l_orderkey": "ord",
        "p_partkey": "part", "l_partkey": "part",
        "s_suppkey": "supp", "l_suppkey": "supp",
        "event_id": "event", "user_id": "user",
        "doc_id": "doc", "vec_id": "doc",
    }
    unit: dict[str, int] = {}
    for tbl, cols in offsets.items():
        df = load_table(spark, src, tbl)
        for c in cols:
            d = domains[c]
            m = df.agg(F.max(c)).collect()[0][0] or 0
            unit[d] = max(unit.get(d, 0), int(m) + 1)

    os.makedirs(dst, exist_ok=True)
    for tbl in TABLES:
        if only is not None and tbl not in only:
            continue
        df = load_table(spark, src, tbl)
        cols = offsets[tbl]
        if not cols:
            out = df
        else:
            parts = []
            for i in range(k):
                rep = df
                for c in cols:
                    rep = rep.withColumn(
                        c, (F.col(c) + F.lit(i * unit[domains[c]]))
                        .cast(dict(df.dtypes)[c]))
                if tbl == "documents" and i > 0:
                    rep = rep.withColumn(
                        "text", F.concat(F.col("text"), F.lit(f" v{i}")))
                parts.append(rep)
            out = reduce(lambda a, b: a.unionByName(b), parts)
        n_files = max(1, min(32, out.rdd.getNumPartitions()))
        (out.repartition(n_files)
            .write.mode("overwrite")
            .parquet(os.path.join(dst, f"{tbl}.parquet")))
        print(tbl, "written")
    print("done ->", dst)


if __name__ == "__main__":
    main()
