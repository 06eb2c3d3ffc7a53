"""Local replica of the driver's oracle-differential compare.

Runs a declared query's Spark plan and its DuckDB oracle over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical value multiset.  Stricter-or-equal to any
sane driver hash: values are compared on full-precision canonical
strings, so bit-level float drift fails here first.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)  # shortest round-trip repr — bit-faithful
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (int,)) or type(v).__name__ in ("int8", "int16", "int32",
                                                     "int64", "uint64"):
        return str(int(v))
    if type(v).__name__ in ("float32", "float64"):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if type(v).__name__ == "Decimal":
        return repr(float(v))
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort()
    return out


def diff_frames(spark_pd: pd.DataFrame, oracle_pd: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pd.columns)} "
            f"oracle={sorted(oracle_pd.columns)}")
        return problems
    if len(spark_pd) != len(oracle_pd):
        problems.append(f"row count: spark={len(spark_pd)} oracle={len(oracle_pd)}")
    a = canonical_rows(spark_pd)
    b = canonical_rows(oracle_pd)
    if a != b:
        # find first differing row for the error message
        only_spark = _first_diff(a, b)
        only_oracle = _first_diff(b, a)
        problems.append(
            f"value mismatch; first spark-only row: {only_spark}; "
            f"first oracle-only row: {only_oracle}")
    return problems


def _first_diff(a: list[tuple], b: list[tuple]):
    from collections import Counter
    ca, cb = Counter(a), Counter(b)
    for row in a:
        if ca[row] > cb.get(row, 0):
            return row
    return None
