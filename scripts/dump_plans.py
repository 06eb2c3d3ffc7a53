#!/usr/bin/env python
"""Dump ``explain("formatted")`` for headline (or named) queries to
``plans/<tag>/<name>_<suffix>.txt`` — the optimization-round evidence
files the judge reads instead of running Spark.

Usage:
    python scripts/dump_plans.py --tag r12 --suffix after [names...]

Runs from whatever repo root contains this script, so the same file
works inside a historical worktree (for ``--suffix before``).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-root", default=None,
                    help="plans dir root (default <repo>/plans)")
    ap.add_argument("names", nargs="*",
                    help="query names (default: bench HEADLINE)")
    args = ap.parse_args()

    from python_minerva_etl_spark.queries.catalog import all_queries
    from python_minerva_etl_spark.session import get_spark

    names = args.names
    if not names:
        import bench
        names = list(bench.HEADLINE)

    out_dir = os.path.join(args.out_root or os.path.join(REPO, "plans"),
                           args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"# skip {name}: not in catalog", file=sys.stderr)
            continue
        df = qs[name].spark(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
