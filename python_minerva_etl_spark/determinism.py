"""Determinism helpers for the oracle gate (SURVEY.md §2 rules).

The driver hash-compares Spark results against a DuckDB oracle, so
every value must be *bit-identical* across engines.  Three hazards and
their fixes:

1. Float aggregation is order-sensitive: ``SUM(double)`` differs in the
   last ULP between engines (different partial-agg association).  Fix:
   sum in DECIMAL — exact, associative — then surface as DOUBLE:
   Spark ``sum(cast(x as decimal(28,s)))`` == DuckDB
   ``SUM(CAST(x AS DECIMAL(28,s)))`` bit-for-bit.  The scale is chosen
   ≥ 2 digits beyond the data's true decimal precision so the
   double→decimal rounding can never hit a tie (ties require the double
   to be exactly k/10^s + 5/10^(s+1), impossible for data whose true
   values have fewer decimals — see tests/test_determinism.py).
2. ``events.ts`` is parquet timestamp[ns]; Spark truncates to µs,
   DuckDB keeps ns.  Never emit a raw event timestamp: bucket it
   (date_trunc) or epoch-floor it in BOTH engines.
3. Top-k / rank need total tiebreak keys (unique id last in ORDER BY).

At 100 TB these helpers are free: decimal partial aggregation is still
a single hash-agg shuffle (Spark's built-in decimal sum), and epoch
bucketing is a scan-local projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Exact sum of a double column, surfaced as double.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(28,{scale}))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(28,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Exact-sum average: decimal-sum as double, divided by count as double.

    Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / CAST(COUNT(x) AS DOUBLE)``.
    Both engines perform the same single IEEE division of identical
    operands, so the result is bit-identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = (F.sum(c.cast(f"decimal(28,{scale})")).cast("double")
           / F.count(c).cast("double"))
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 4) -> str:
    return (f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"
            f" / CAST(COUNT({expr}) AS DOUBLE)")


def epoch_bucket(ts: Column | str, seconds: int) -> Column:
    """Fixed-duration bucket as TIMESTAMP via epoch floor.

    Oracle twin: ``to_timestamp(CAST(floor(epoch(ts)/N)*N AS BIGINT))``
    (DuckDB ``epoch`` keeps the fractional part; ``unix_timestamp``
    floors — both floor identically for post-1970 data after the
    explicit ``floor``).
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        (F.floor(F.unix_timestamp(c) / seconds) * seconds).cast("long"))
