#!/usr/bin/env python
"""Driver-window pre-flight: drive declared queries against their
DuckDB oracles the way the ROUND DRIVER does — a fresh VANILLA
SparkSession (not our tuned ``session.get_spark``), plus an optional
hostile session timezone — so a window rotation never ships a query
that only passes under the tuned config.

Usage:
  python scripts/validate_window.py              # current _WINDOW, UTC
  python scripts/validate_window.py --all        # every declared query
  python scripts/validate_window.py --tz America/New_York
  python scripts/validate_window.py name1 name2  # specific queries

Exit code 0 = all green; 1 = any mismatch/error (printed).
"""

from __future__ import annotations

import argparse
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    cols = sorted(df.columns)

    def cv(v):
        if v is None or v is pd.NaT:
            return "NULL"
        # Spark hands lists, DuckDB numpy arrays — compare elementwise
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cv(x) for x in v) + "]"
        if isinstance(v, float):
            return "NULL" if math.isnan(v) else repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if type(v).__name__ in ("float32", "float64"):
            f = float(v)
            return "NULL" if math.isnan(f) else repr(f)
        if type(v).__name__ in ("int8", "int16", "int32", "int64"):
            return str(int(v))
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return str(v)

    return sorted(tuple(cv(v) for v in r)
                  for r in df[cols].itertuples(index=False, name=None))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--tz", default="UTC")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", args.tz)
             .config("spark.ui.enabled", "false")
             .appName(f"validate-window-{args.tz}").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    if args.names:
        names = args.names
    elif args.all:
        names = list(qs)
    else:
        from python_minerva_etl_spark.queries.catalog import _WINDOW
        names = list(_WINDOW)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    bad = []
    for name in names:
        try:
            spd = qs[name](spark, args.sf_dir).toPandas()
            if name in osql:
                opd = con.execute(osql[name]).df()
                if canon(spd) != canon(opd):
                    bad.append((name, "MISMATCH"))
                    continue
                status = f"ok {len(spd)} (oracle-exact)"
            else:
                status = f"ok {len(spd)} (rows-only)"
        except Exception as ex:  # noqa: BLE001 — report, don't die
            bad.append((name, f"ERR {type(ex).__name__}: {ex}"[:160]))
            continue
        print(f"{name}: {status}")
    if bad:
        print(f"\n{len(bad)} FAILURE(S):")
        for name, why in bad:
            print(f"  {name}: {why}")
        return 1
    print(f"\nall {len(names)} green (tz={args.tz})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
