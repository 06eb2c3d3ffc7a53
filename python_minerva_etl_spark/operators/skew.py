"""Skew-resilient aggregation — salting for hot entity keys.

Minerva's telecom deployments have pathological entities (a busy core
node emits orders of magnitude more rows than a leaf cell).  AQE's
skew-join splitting handles *joins*; for wide **aggregations over hot
keys** the classic fix is salted two-phase aggregation:

  phase 1: group by (key, salt) where salt = hash(row) % N — hot keys
           fan out across N reducers;
  phase 2: re-aggregate the N partials per key.

Works for any decomposable aggregate (sum/count/min/max — and avg via
(sum, samples), Minerva's own re-aggregation invariant).  The decimal
partials keep both phases exact, so salted results are bit-identical
to unsalted ones (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: list[str], salt_buckets: int,
               aggs: dict[str, tuple[Column, Column]]) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output name -> (phase1 aggregate over input rows,
    phase2 aggregate over the phase-1 partial column of that name).
    Example::

        salted_agg(ev, ["user_id"], 32, {
            "samples": (F.count("*"), F.sum("samples")),
            "sum_value": (F.sum(col("value").cast("decimal(28,4)")),
                          F.sum("sum_value")),
        })
    """
    salt = (F.xxhash64(*[F.col(c) for c in df.columns])
            % F.lit(salt_buckets)).alias("__salt")
    phase1 = (df.withColumn("__salt", salt)
              .groupBy(*key, "__salt")
              .agg(*[a1.alias(name) for name, (a1, _) in aggs.items()]))
    return (phase1.groupBy(*key)
            .agg(*[a2.alias(name) for name, (_, a2) in aggs.items()]))


def salted_join(big: DataFrame, small: DataFrame, key: list[str],
                salt_buckets: int, row_col: str) -> DataFrame:
    """Salted equi-join for hot join keys too large for AQE's runtime
    skew splitting (or when the small side must shuffle anyway):

      big side:   salt = xxhash64(row_col) % N — a hot key's rows
                  spread across N reducer partitions;
      small side: each row replicated N times (one per salt value);
      join on (key..., salt).

    Result is row-identical to the unsalted join — the salt only
    changes the partitioning.  Replication multiplies the small side
    by N, so pick N ≈ (hottest-key rows / target partition rows) and
    keep the small side genuinely small; if it fits in a broadcast,
    broadcast instead and skip salting entirely.  ``row_col`` must be
    non-null; rows with equal values still distribute (xxhash64 of
    the value, not of the physical row)."""
    salt_b = F.pmod(F.xxhash64(F.col(row_col)), F.lit(salt_buckets))
    bigs = big.withColumn("__salt", salt_b)
    smalls = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             F.lit(salt_buckets - 1).cast("bigint"))))
    return bigs.join(smalls, [*key, "__salt"]).drop("__salt")
