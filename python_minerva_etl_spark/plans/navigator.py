"""Aggregate navigation — route a granularity-G query to the coarsest
materialized store that G nests exactly into, then re-aggregate the
PARTIALS (never the raw rows).

Reference semantics: Minerva's materialization chains 15m → 1h → 1d →
1w/1month, and every read of a coarse KPI should hit the coarsest
usable store — the daily rollup touches 1/96th of the 15m rows and
1/3600th of the raw rows.  The navigator encodes the nesting partial
order (calendar rules included: weeks and months are both whole days
but do NOT nest in each other) and the re-aggregation algebra (sums
and counts SUM, min/max re-extremize, averages travel as
(sum, samples) — the invariant every store carries ``samples`` for).

At 100 TB this choice IS the query plan: the same declared question
costs orders of magnitude less when routed to partials, and the
re-aggregation is one hash-agg over store-cardinality input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..granularity import _GRANULARITIES, normalize, trunc_col
from .instance import TrendStorePart

# approximate calendar-bucket widths, used only to RANK candidates
# (coarser = fewer rows = cheaper to re-aggregate)
_CALENDAR_APPROX = {"1d": 86400, "1w": 7 * 86400, "1month": 30 * 86400}


def _fixed_seconds(g: str) -> int | None:
    """Fixed period in seconds, or None for calendar granularities.
    Derived from granularity._GRANULARITIES so every name the package
    supports (1m/5m/15m/30m/1h/900/3600/...) is covered."""
    return _GRANULARITIES[normalize(g)][0]


def _approx_seconds(g: str) -> int:
    secs = _fixed_seconds(g)
    return secs if secs is not None else _CALENDAR_APPROX[normalize(g)]


def nests_in(fine: str, coarse: str) -> bool:
    """True iff every ``coarse`` bucket is an exact union of ``fine``
    buckets (so partials at ``fine`` re-aggregate losslessly to
    ``coarse``).  Calendar rules: days nest in weeks and months;
    weeks do NOT nest in months; fixed periods nest in calendar
    buckets iff they divide a day.

    ASSUMES UTC (or whole-hour-offset) calendar buckets, which is
    what :func:`reaggregate_time` always produces — it truncates in
    UTC.  Under a tz-LOCAL calendar store in a fractional-offset zone
    (+05:45 Kathmandu, +09:30 Adelaide), epoch-aligned 1h/30m buckets
    straddle civil-day boundaries and do NOT nest; do not feed
    tz-local stores through the navigator.  (Whole-hour DST shifts
    are fine: a 23/25h local day is still whole hours and quarters.)
    """
    fine, coarse = normalize(fine), normalize(coarse)
    if fine == coarse:
        return True
    fs, cs = _fixed_seconds(fine), _fixed_seconds(coarse)
    if fs is not None:
        if cs is not None:
            return cs % fs == 0
        return 86400 % fs == 0  # calendar coarse: must divide a day
    if fine == "1d":
        return coarse in ("1w", "1month")
    return False  # 1w / 1month nest in nothing coarser here


def choose_level(available: list[str], target: str) -> str | None:
    """The coarsest available granularity that nests in ``target`` —
    the store the query should read.  None when no store is usable
    (caller falls back to raw facts)."""
    usable = [g for g in available if nests_in(g, target)]
    if not usable:
        return None
    return max(usable, key=_approx_seconds)


def reaggregate_time(partials: DataFrame, part: TrendStorePart,
                     entity_col: str, ts_col: str,
                     target_granularity: str) -> DataFrame:
    """Re-aggregate a partial store to a coarser granularity with the
    re-agg algebra (NOT the raw-row algebra): sum/avg-sum/count
    partials SUM, min/max re-extremize, and ``samples`` always sums —
    so stored (sum, samples) averages stay exact through any number
    of chained rollups."""
    _REAGG = {"sum": F.sum, "avg": F.sum, "count": F.sum,
              "max": F.max, "min": F.min}
    aggs = []
    for t in part.trends:
        fn = _REAGG[t.time_aggregation.lower()]
        aggs.append(fn(F.col(t.name)).alias(t.name))
    aggs.append(F.sum("samples").cast("bigint").alias("samples"))
    return (partials.groupBy(
        F.col(entity_col),
        trunc_col(F.col(ts_col), target_granularity).alias(ts_col))
        .agg(*aggs))


def navigate(stores: dict[str, DataFrame], target: str,
             part: TrendStorePart, entity_col: str,
             ts_col: str) -> tuple[str, DataFrame] | None:
    """Pick the coarsest usable store and return
    ``(chosen_granularity, frame_at_target)``; a store already at the
    target granularity is returned as-is.  None = no usable store
    (query must fall back to the raw facts)."""
    chosen = choose_level(list(stores), target)
    if chosen is None:
        return None
    df = stores[chosen]
    if normalize(chosen) == normalize(target):
        return chosen, df
    return chosen, reaggregate_time(df, part, entity_col, ts_col, target)
