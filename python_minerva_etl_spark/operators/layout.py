"""Multi-dimensional data layout — Z-order clustering for file pruning.

Date-partitioned stores prune perfectly on time but not on a second
predicate column: a query for one entity still opens every file of the
scanned partitions.  The standard fix (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders) is to rewrite each partition sorted by a
space-filling curve over the hot predicate columns, so every file
covers a small hyper-rectangle of the key space and parquet min/max
footer stats prune most files for point/range predicates on ANY of the
curve columns.

Implementation is pure Catalyst (no UDF):
1. quantize each column to ``2^bits`` ranks via percentile literals
   (deterministic — same technique as operators/ranking.py; rank
   quantization makes the curve robust to skew where linear min/max
   scaling collapses);
2. interleave the rank bits into the Z-value with shift/OR
   expressions;
3. range-repartition + sort by Z and write.

The quantile job is tiny; the rewrite is one range shuffle — the same
cost as the plain sort every compaction already pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_bounds(df: DataFrame, col: str, bits: int) -> list:
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    row = df.agg(F.percentile_approx(col, probs, 10_000).alias("q")).first()
    return sorted({x for x in (row["q"] or []) if x is not None})


def _quantize(col: Column, bounds: list) -> Column:
    q = F.lit(0)
    for b in bounds:
        q = q + F.when(col > F.lit(b), 1).otherwise(0)
    return q


def zorder_value(df: DataFrame, cols: list[str], bits: int = 6) -> Column:
    """The Z (Morton) value over ``cols`` as a Catalyst expression:
    per-column percentile rank (``bits`` bits each), bit-interleaved.
    NULL ranks as 0 (start of the curve)."""
    ranks = []
    for c in cols:
        bounds = _rank_bounds(df, c, bits)
        ranks.append(F.coalesce(_quantize(F.col(c), bounds), F.lit(0)))
    z = F.lit(0).cast("long")
    k = len(cols)
    for bit in range(bits):
        for j, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(r.bitwiseAND(F.lit(1 << bit)).cast("long"),
                            bit * (k - 1) + j))
    return z


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 bits: int = 6, num_files: int | None = None,
                 mode: str = "overwrite") -> None:
    """Rewrite ``df`` to ``path`` clustered on the Z-curve over
    ``cols``.  Each output file then covers a compact hyper-rectangle
    of the key space — point/range scans on any curve column prune to
    a handful of files via parquet footer stats (asserted in
    tests/test_layout.py)."""
    if num_files is None:
        num_files = df.sparkSession.sparkContext.defaultParallelism
    z = zorder_value(df, cols, bits)
    (df.withColumn("__z", z)
       .repartitionByRange(num_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).parquet(path))
