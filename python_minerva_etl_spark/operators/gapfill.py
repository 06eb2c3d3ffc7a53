"""Dense-spine gap filling for trend series — carry-forward imputation.

Reference semantics: Minerva trend stores leave buckets with no samples
absent (gap detection alarms on them — see ``_gap_detect`` in
``queries/aggregation.py``); KPI consumers that need a *dense* series
(dashboards, rate computations over counters) carry the last known
value forward across the gap.  This operator is the constructive
complement of gap detection: same dense spine, but instead of
anti-joining the present buckets away it left-joins them in and
forward-fills.

Spark mapping (scale shape):
- the spine is ``sequence(min_bucket, max_bucket, step)`` exploded per
  entity — generated from a tiny per-entity span aggregate, never a
  driver-side loop;
- spine ⋈ series is one shuffle on ``(entity, bucket)`` (AQE coalesces
  the mostly-empty post-join partitions);
- the carry-forward is ``last(value, ignorenulls=True)`` over an
  entity-partitioned, bucket-ordered growing window — one sort per
  entity partition, linear, no second shuffle (the join already
  hash-partitioned by entity via the composite key; Spark re-sorts
  within partitions only).

At 100 TB the spine size is bounded by entities × buckets-in-span,
not by raw rows — gap filling runs on the *aggregated* trend series,
which is orders of magnitude smaller than the ingest data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fill_gaps(series: DataFrame, entity_col: str, bucket_col: str,
              step: str, value_cols: list[str],
              carry: bool = True) -> DataFrame:
    """Densify a sparse ``(entity, bucket, values...)`` trend series.

    Every bucket in ``[min(bucket), max(bucket)]`` per entity (stepped
    by ``step``, e.g. ``"1 day"``) appears exactly once in the output.
    ``was_gap`` marks buckets that had no source row (a present row
    whose values happen to be NULL is NOT a gap); when ``carry`` is
    set, ``value_cols`` are forward-filled from the last non-NULL
    bucket (leading gaps stay NULL — there is nothing to carry).
    Other columns of ``series`` are passed through (NULL on gap rows).
    """
    spans = series.groupBy(entity_col).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
    spine = spans.select(
        entity_col,
        F.explode(F.sequence("__lo", "__hi", F.expr(f"interval {step}")))
        .alias(bucket_col))
    joined = spine.join(series.withColumn("__present", F.lit(True)),
                        [entity_col, bucket_col], "left")
    out = (joined.withColumn("was_gap", F.col("__present").isNull())
           .drop("__present"))
    if carry:
        w = (Window.partitionBy(entity_col).orderBy(bucket_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        for c in value_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def interpolate_gaps(series: DataFrame, entity_col: str, bucket_col: str,
                     step: str, value_cols: list[str]) -> DataFrame:
    """Densify like :func:`fill_gaps` but *linearly interpolate*
    interior gaps between the neighbouring known values instead of
    carrying the last one forward — the imputation KPI consumers want
    for continuous measurements (a carried-forward gauge flatlines;
    an interpolated one trends).  Leading/trailing gaps have only one
    neighbour and stay NULL.

    Scale shape: identical to ``fill_gaps`` — one (entity, bucket)
    shuffle for the spine join, then BOTH direction windows (last
    non-null before, first non-null after) share one entity-partitioned
    bucket-ordered sort; Spark evaluates the following-frame window
    over the same sort, so interpolation costs no extra exchange.

    The abscissa is epoch microseconds as double (exact for any real
    timestamp — |µs| < 2^53), so the interpolation weight
    ``(x - x_prev) / (x_next - x_prev)`` is bit-portable across
    engines (DuckDB twin: ``CAST(epoch_us(...) AS DOUBLE)``).
    """
    dense = fill_gaps(series, entity_col, bucket_col, step, value_cols,
                      carry=False)
    wb = (Window.partitionBy(entity_col).orderBy(bucket_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(entity_col).orderBy(bucket_col)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    x = F.unix_micros(F.col(bucket_col)).cast("double")
    out = dense
    for c in value_cols:
        xv = F.when(F.col(c).isNotNull(), x)
        pv = F.last(c, ignorenulls=True).over(wb)
        px = F.last(xv, ignorenulls=True).over(wb)
        nv = F.first(c, ignorenulls=True).over(wf)
        nx = F.first(xv, ignorenulls=True).over(wf)
        interp = pv + (nv - pv) * ((x - px) / (nx - px))
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(pv.isNotNull() & nv.isNotNull(), interp))
    return out
