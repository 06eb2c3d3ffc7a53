"""Declared queries: time aggregation — the heart of Minerva.

Reference semantics (minerva SQL-gen for aggregations,
minerva/commands/aggregation.py + instance YAML [U]): group trend rows
by (entity, granularity-truncated timestamp), apply each trend's
``time_aggregation`` function, always add ``samples = count(*)`` so
averages re-aggregate exactly as SUM(sum)/SUM(samples).

Scale notes: each query is ONE hash-aggregate over the fact table —
a single shuffle on (entity, bucket).  Partial aggregation (map-side
combine) is automatic; the decimal sums keep the partial/final merge
exact.  The 1h→1d re-aggregation reads the *hourly* partials, which at
100 TB is the whole point: the daily rollup touches 1/3600th of the
raw rows (Minerva's materialization chains 15m→1h→1d→1w the same way).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..determinism import davg, dsum, epoch_bucket, oracle_davg, oracle_dsum
from .base import DeclaredQuery, t

def _err():
    # built lazily — Column construction needs an active SparkContext
    return F.when(F.col("event_type") == "error", 1)


def _agg_time_1h(spark, sf_dir):
    """OP-AGG-TIME at 1h — the flagship (SURVEY.md §7.1)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("samples"),
            dsum("value", 4, "sum_value"),
            davg("value", 4, "avg_value"),
            F.count(_err()).alias("n_error"),
        )
    )


_AGG_TIME_1H_SQL = f"""
SELECT user_id,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value,
       {oracle_davg('value')} AS avg_value,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
FROM events
GROUP BY 1, 2
"""


def _agg_time_15m(spark, sf_dir):
    """OP-AGG-TIME at 15m (fixed-duration epoch bucket, granularity.trunc_col)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", epoch_bucket("ts", 900).alias("bucket"))
        .agg(F.count("*").alias("samples"), dsum("value", 4, "sum_value"))
    )


_AGG_TIME_15M_SQL = f"""
SELECT user_id,
       TIMESTAMP '1970-01-01 00:00:00'
         + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)) AS bucket,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


def _agg_time_1d(spark, sf_dir):
    """OP-AGG-TIME at 1d (calendar bucket, per event_type)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("samples"),
            dsum("value", 4, "sum_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
        )
    )


_AGG_TIME_1D_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value,
       MAX(value) AS max_value,
       MIN(value) AS min_value
FROM events
GROUP BY 1, 2
"""


def _agg_time_1month(spark, sf_dir):
    """OP-AGG-TIME at 1month — *calendar* bucket: date_trunc under the
    session tz, never window() (fixed-duration windows are wrong for
    months/DST — SURVEY.md §4)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("month", "ts").alias("month"), "event_type")
        .agg(F.count("*").alias("samples"), dsum("value", 4, "sum_value"))
    )


_AGG_TIME_1MONTH_SQL = f"""
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
       event_type,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


def _agg_time_1w(spark, sf_dir):
    """OP-AGG-TIME at 1w — ISO-week calendar bucket (Monday start in
    both engines)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("week", "ts").alias("week"), "user_id")
        .agg(F.count("*").alias("samples"), dsum("value", 4, "sum_value"))
    )


_AGG_TIME_1W_SQL = f"""
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       user_id,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


def _agg_reagg_avg(spark, sf_dir):
    """OP-AGG-PARTIAL: daily AVG computed from *hourly* (sum, samples)
    partials — exact because the partials are decimal.  This is
    Minerva's re-aggregatable-average contract: every aggregate store
    carries ``samples`` so AVG(1d) = SUM(sum_1h)/SUM(samples_1h)."""
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.sum(F.col("value").cast("decimal(28,4)")).alias("sum_dec"),
            F.count("value").alias("samples"),
        )
    )
    return (
        hourly.groupBy("user_id", F.date_trunc("day", "bucket").alias("day"))
        .agg(
            (F.sum("sum_dec").cast("double")
             / F.sum("samples").cast("double")).alias("avg_value"),
            F.sum("samples").cast("bigint").alias("samples"),
        )
    )


# Oracle computes the daily average directly — mathematically identical
# because the hourly decimal partials sum to the same exact total.
_AGG_REAGG_AVG_SQL = f"""
SELECT user_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       {oracle_davg('value')} AS avg_value,
       COUNT(value) AS samples
FROM events
GROUP BY 1, 2
"""


def _agg_count_distinct(spark, sf_dir):
    """OP-AGG-DISTINCT: exact distinct entities per class."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


_AGG_COUNT_DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
"""


def _agg_approx_distinct(spark, sf_dir):
    """OP-AGG-DISTINCT (approx): HLL sketch — the 100 TB path, where an
    exact distinct would shuffle every (type, user) pair.  Rows-only
    check: the estimate is engine-specific by design."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("n_users_approx"))
    )


def _agg_conditional(spark, sf_dir):
    """OP-AGG-FILTER: conditional aggregation per entity."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(_err()).alias("n_error"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .cast("decimal(28,4)")
        ).cast("double").alias("purchase_value"),
    )


_AGG_CONDITIONAL_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE)
         AS purchase_value
FROM events
GROUP BY 1
"""


def _agg_percentiles(spark, sf_dir):
    """Exact percentiles per class (KPI distribution reporting).
    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` share
    the same linear-interpolation formula — verified bit-identical
    (unlike approx_percentile, which is sketch-based → rows-only)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("p50"),
             F.expr("percentile(value, 0.9)").alias("p90"),
             F.expr("percentile(value, 0.99)").alias("p99"),
             F.count("*").alias("samples"))
    )


_AGG_PERCENTILES_SQL = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       COUNT(*) AS samples
FROM events
GROUP BY 1
"""


def _agg_variance_exact(spark, sf_dir):
    """Sample variance/stddev per class — computed from exact decimal
    partials (Σx, Σx²) then one identical double formula in both
    engines: built-in var_samp is FP-order-sensitive across engines,
    this formulation is not."""
    ev = t(spark, sf_dir, "events")
    s = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    sq = F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)")) \
        .cast("double")
    n = F.count("value").cast("double")
    var = (sq - s * s / n) / (n - F.lit(1.0))
    return (ev.groupBy("event_type")
            .agg(var.alias("var_value"),
                 F.sqrt(var).alias("std_value"),
                 F.count("*").alias("samples")))


_AGG_VARIANCE_EXACT_SQL = """
SELECT event_type,
       (CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
        - CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
          * CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
          / CAST(COUNT(value) AS DOUBLE))
       / (CAST(COUNT(value) AS DOUBLE) - 1.0) AS var_value,
       sqrt((CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
        - CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
          * CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
          / CAST(COUNT(value) AS DOUBLE))
       / (CAST(COUNT(value) AS DOUBLE) - 1.0)) AS std_value,
       COUNT(*) AS samples
FROM events
GROUP BY 1
"""


def _agg_string_concat(spark, sf_dir):
    """Ordered distinct string aggregation (report labels): sorted
    collect_set ≡ string_agg(DISTINCT … ORDER BY …)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.array_join(F.array_sort(F.collect_set("event_type")), ",")
             .alias("event_types"))
    )


_AGG_STRING_CONCAT_SQL = """
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type)
         AS event_types
FROM events
GROUP BY 1
"""


def _agg_corr_exact(spark, sf_dir):
    """Pearson correlation between the value trend and the JSON ``k``
    attribute, from exact decimal partials (Σx, Σy, Σxy, Σx², Σy²) —
    built-in corr() drifts across engines; this formulation is
    bit-identical."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("int").alias("k"))
    y = F.col("k").cast("double")
    sx = F.sum(F.col("x").cast("decimal(28,4)")).cast("double")
    sy = F.sum(y.cast("decimal(28,4)")).cast("double")
    sxy = F.sum((F.col("x") * y).cast("decimal(28,6)")).cast("double")
    sxx = F.sum((F.col("x") * F.col("x")).cast("decimal(28,6)")).cast("double")
    syy = F.sum((y * y).cast("decimal(28,6)")).cast("double")
    n = F.count("x").cast("double")
    corr = ((n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    return (ev.groupBy("event_type")
            .agg(corr.alias("corr_value_k"), F.count("*").alias("samples")))


_AGG_CORR_EXACT_SQL = """
WITH e AS (
  SELECT event_type, value AS x,
         CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS DOUBLE) AS y
  FROM events
)
SELECT event_type,
       (CAST(COUNT(x) AS DOUBLE)
          * CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE)
        - CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)
          * CAST(SUM(CAST(y AS DECIMAL(28,4))) AS DOUBLE))
       / sqrt((CAST(COUNT(x) AS DOUBLE)
                 * CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE)
               - CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)
                 * CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE))
              * (CAST(COUNT(x) AS DOUBLE)
                 * CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE)
               - CAST(SUM(CAST(y AS DECIMAL(28,4))) AS DOUBLE)
                 * CAST(SUM(CAST(y AS DECIMAL(28,4))) AS DOUBLE)))
         AS corr_value_k,
       COUNT(*) AS samples
FROM e
GROUP BY 1
"""


def _agg_histogram(spark, sf_dir):
    """Value-distribution histogram: fixed-width bins (25.0), top bin
    open-ended — integer bin arithmetic is engine-portable."""
    ev = t(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / 25.0), F.lit(9)).cast("bigint")
    return (ev.groupBy(bin_.alias("bin"))
            .agg(F.count("*").alias("n"),
                 F.min("value").alias("lo"),
                 F.max("value").alias("hi")))


_AGG_HISTOGRAM_SQL = """
SELECT CAST(least(floor(value / 25.0), 9) AS BIGINT) AS bin,
       COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
FROM events
GROUP BY 1
"""


def _gap_detect(spark, sf_dir):
    """Minerva missing-data detection: per entity, which daily buckets
    in its active span have NO data (dense spine anti-join) — the
    existence check behind trend gap alarms."""
    ev = t(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"))
    spine = spans.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day")))
        .alias("day"))
    present = (ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
               .distinct())
    return spine.join(present, ["user_id", "day"], "left_anti")


_GAP_DETECT_SQL = """
WITH spans AS (
  SELECT user_id,
         CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS hi
  FROM events GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
  FROM spans
),
present AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
)
SELECT s.user_id, s.day FROM spine s
WHERE NOT EXISTS (SELECT 1 FROM present p
                  WHERE p.user_id = s.user_id AND p.day = s.day)
"""


def _gap_fill(spark, sf_dir):
    """Constructive complement of gap_detect: densify the per-user
    daily series and carry the last known value forward across gaps
    (dashboard/counter-rate input).  Daily sums use decimal partials
    so the carried double is bit-identical to the oracle's."""
    from ..operators.gapfill import fill_gaps

    ev = t(spark, sf_dir, "events")
    daily = (ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(28,4)"))
                  .cast("double").alias("day_value"),
                  F.count("*").alias("samples")))
    filled = fill_gaps(daily, "user_id", "day", "1 day", ["day_value"])
    return filled.select(
        "user_id", "day", "day_value",
        F.coalesce("samples", F.lit(0).cast("bigint")).alias("samples"),
        "was_gap")


_GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS day_value,
         COUNT(*) AS samples
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
          FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
  FROM spans
),
j AS (
  SELECT s.user_id, s.day, d.day_value, d.samples
  FROM spine s LEFT JOIN daily d USING (user_id, day)
)
SELECT user_id, day,
       last_value(day_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_value,
       COALESCE(samples, 0) AS samples,
       samples IS NULL AS was_gap
FROM j
"""


def _agg_mode(spark, sf_dir):
    """OP-AGG (mode): most frequent event_type per user (ties broken
    to the lexicographically last type) — two partial-aggregatable
    hash aggs (count per (user, type), then struct-max per user);
    never a per-group sort."""
    ev = t(spark, sf_dir, "events")
    counts = (ev.groupBy("user_id", "event_type")
              .agg(F.count("*").alias("__c")))
    return (counts
            .groupBy("user_id")
            .agg(F.max(F.struct(F.col("__c").alias("c"),
                                F.col("event_type"))).alias("m"))
            .select("user_id",
                    F.col("m.event_type").alias("mode_type"),
                    F.col("m.c").alias("n_occurrences")))


_AGG_MODE_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS mode_type, n AS n_occurrences FROM (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type DESC) AS rn
  FROM c) WHERE rn = 1
"""


def _gap_interpolate(spark, sf_dir):
    """Linear-interpolation twin of gap_fill: interior gaps in the
    per-user daily series take the straight line between neighbouring
    known days (leading/trailing gaps stay NULL).  Epoch-µs-as-double
    abscissa keeps the interpolation weight bit-portable."""
    from ..operators.gapfill import interpolate_gaps

    ev = t(spark, sf_dir, "events")
    daily = (ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(28,4)"))
                  .cast("double").alias("day_value")))
    filled = interpolate_gaps(daily, "user_id", "day", "1 day",
                              ["day_value"])
    return filled.select("user_id", "day", "day_value", "was_gap")


_GAP_INTERPOLATE_SQL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS day_value,
         TRUE AS present
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
          FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
  FROM spans
),
j AS (
  SELECT s.user_id, s.day, d.day_value,
         d.present IS NULL AS was_gap,
         CAST(epoch_us(s.day) AS DOUBLE) AS xb,
         CASE WHEN d.day_value IS NOT NULL
              THEN CAST(epoch_us(s.day) AS DOUBLE) END AS xv
  FROM spine s LEFT JOIN daily d USING (user_id, day)
),
w AS (
  SELECT user_id, day, day_value, was_gap, xb,
         last_value(day_value IGNORE NULLS) OVER wprev AS pv,
         last_value(xv IGNORE NULLS) OVER wprev AS px,
         first_value(day_value IGNORE NULLS) OVER wnext AS nv,
         first_value(xv IGNORE NULLS) OVER wnext AS nx
  FROM j
  WINDOW wprev AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wnext AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       CASE WHEN day_value IS NOT NULL THEN day_value
            WHEN pv IS NOT NULL AND nv IS NOT NULL
            THEN pv + (nv - pv) * ((xb - px) / (nx - px))
       END AS day_value,
       was_gap
FROM w
"""


def _agg_time_weighted_avg(spark, sf_dir):
    """OP-AGG (time-weighted average): the gauge KPI — each sample
    weighted by how long it was current (until the entity's next
    sample), the standard irregular-sampling average a plain AVG gets
    wrong.  One entity-partitioned window sort for the lead; weights
    are integer microseconds and the weighted mass accumulates in
    DECIMAL.  The ratio is rounded to 6 dp in the declared output:
    DuckDB converts hugeint-backed decimals to double via two-step
    float arithmetic (not correctly rounded), so the raw ratio can
    differ in the last ulp across engines even though both decimal
    integrands are identical (verified) — the rounding pins the
    comparable surface, the mass itself is exact."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = (F.lead(F.unix_micros("ts")).over(w)
          - F.unix_micros("ts")).alias("dt_us")
    seg = (ev.select("user_id", "event_id", "value", dt)
           .filter(F.col("dt_us").isNotNull()))
    return (seg.groupBy("user_id")
            .agg(F.sum(F.col("value").cast("decimal(14,4)")
                       * F.col("dt_us").cast("decimal(14,0)"))
                 .cast("decimal(38,4)").alias("weighted_mass"),
                 F.sum("dt_us").cast("bigint").alias("span_us"),
                 F.count("*").alias("n_segments"))
            .select("user_id", "span_us", "n_segments",
                    F.round(F.col("weighted_mass").cast("double")
                            / F.col("span_us").cast("double"), 6)
                    .alias("twa_value")))


_AGG_TIME_WEIGHTED_AVG_SQL = """
WITH seg AS (
  SELECT user_id, value,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       COUNT(*) AS n_segments,
       round(CAST(SUM(CAST(value AS DECIMAL(14,4))
                      * CAST(dt_us AS DECIMAL(14,0))) AS DOUBLE)
             / CAST(SUM(dt_us) AS DOUBLE), 6) AS twa_value
FROM seg WHERE dt_us IS NOT NULL
GROUP BY 1
"""



def _agg_arg_extremes(spark, sf_dir):
    """OP-AGG (argmin/argmax): per user, WHICH event carried the
    extreme value (max_by/min_by) — one partial-aggregatable hash agg,
    never a rank-then-filter window.  event_id tiebreak keeps the
    answer deterministic under value ties."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.max(F.struct("value", "event_id")).alias("__mx"),
                 F.min(F.struct("value", "event_id")).alias("__mn"))
            .select("user_id",
                    F.col("__mx.event_id").alias("max_event_id"),
                    F.col("__mx.value").alias("max_value"),
                    F.col("__mn.event_id").alias("min_event_id"),
                    F.col("__mn.value").alias("min_value")))


_AGG_ARG_EXTREMES_SQL = """
SELECT user_id,
       (MAX(struct_pack(v := value, e := event_id))).e AS max_event_id,
       (MAX(struct_pack(v := value, e := event_id))).v AS max_value,
       (MIN(struct_pack(v := value, e := event_id))).e AS min_event_id,
       (MIN(struct_pack(v := value, e := event_id))).v AS min_value
FROM events GROUP BY 1
"""



def _agg_user_growth(spark, sf_dir):
    """OP-AGG (growth accounting): per day — first-seen (new) users,
    active users, and the cumulative unique-user count.  Two
    entity-keyed aggs collapse the corpus to |days| rows; the running
    total's single-partition window is over that tiny frame only
    (days, not events), so it is scale-free."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    first = (ev.groupBy("user_id")
             .agg(F.min(F.date_trunc("day", "ts")).alias("day")))
    new_d = first.groupBy("day").agg(F.count("*").alias("n_new"))
    active = (ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
              .distinct().groupBy("day")
              .agg(F.count("*").alias("n_active")))
    joined = (active.join(new_d, "day", "left")
              .select("day", F.coalesce("n_new", F.lit(0)).cast("bigint")
                      .alias("n_new"), "n_active"))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.withColumn(
        "cum_users", F.sum("n_new").over(w).cast("bigint"))


_AGG_USER_GROWTH_SQL = """
WITH first AS (
  SELECT user_id,
         CAST(MIN(date_trunc('day', ts)) AS TIMESTAMP) AS day
  FROM events GROUP BY 1
),
new_d AS (SELECT day, COUNT(*) AS n_new FROM first GROUP BY 1),
active AS (
  SELECT day, COUNT(*) AS n_active FROM (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           user_id FROM events) GROUP BY 1
)
SELECT a.day, COALESCE(n.n_new, 0) AS n_new, a.n_active,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER (
         ORDER BY a.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM active a LEFT JOIN new_d n ON a.day = n.day
"""



def _agg_cube(spark, sf_dir):
    """OP-GROUPSETS (CUBE): every subtotal combination over
    (region, segment) with GROUPING flags — the full-cube depth twin
    of agg_rollup_sets' hierarchy ROLLUP.  Dims broadcast; one
    expand+agg shuffle."""
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    joined = (cust.join(F.broadcast(nat),
                        cust.c_nationkey == nat.n_nationkey)
              .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey))
    return (joined.cube("r_name", "c_mktsegment")
            .agg(F.count("*").alias("n_customers"),
                 F.sum(F.col("c_acctbal").cast("decimal(28,2)"))
                 .cast("double").alias("total_balance"),
                 F.grouping("r_name").cast("int").alias("g_region"),
                 F.grouping("c_mktsegment").cast("int")
                 .alias("g_segment")))


_AGG_CUBE_SQL = """
SELECT r_name, c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
         AS total_balance,
       CAST(GROUPING(r_name) AS INTEGER) AS g_region,
       CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_segment
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, c_mktsegment)
"""


def _seq_gap_ranges(spark, sf_dir):
    """OP-AGG (sequence integrity): contiguous gap ranges in the
    event_id sequence — the load-completeness check a batch pipeline
    runs after every harvest (missing-id ranges name exactly what to
    re-request).  Exercised on the 'click' sub-feed — its ids are a
    strict subset of the global sequence, so real ranges come back.
    One global sort of the *ids only* (bigint column, not rows); each
    gap is derived scan-local from lead()."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type") == "click")
    w = Window.orderBy("event_id")
    ids = ev.select("event_id").withColumn(
        "__next", F.lead("event_id").over(w))
    return (ids.filter(F.col("__next") > F.col("event_id") + 1)
            .select((F.col("event_id") + 1).alias("gap_start"),
                    (F.col("__next") - 1).alias("gap_end"),
                    (F.col("__next") - F.col("event_id") - 1)
                    .alias("n_missing")))


_SEQ_GAP_RANGES_SQL = """
WITH ids AS (
  SELECT event_id,
         LEAD(event_id) OVER (ORDER BY event_id) AS nxt
  FROM events WHERE event_type = 'click'
)
SELECT event_id + 1 AS gap_start,
       nxt - 1 AS gap_end,
       nxt - event_id - 1 AS n_missing
FROM ids WHERE nxt > event_id + 1
"""



def _agg_rollup_sets(spark, sf_dir):
    """OP-GROUPSETS: ROLLUP(region, nation) over the customer dimension.
    Dims are broadcast — no shuffle for the joins; one shuffle for the
    grouping-sets expand+agg."""
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    joined = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal", 4, "sum_acctbal"),
    )


_AGG_ROLLUP_SETS_SQL = f"""
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       {oracle_dsum('c_acctbal')} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def _agg_time_sliding(spark, sf_dir):
    """OP-AGG-TIME (hopping windows): 1h windows sliding every 15m —
    every event lands in exactly size/slide = 4 overlapping windows.
    Spark's native F.window(slide) materializes the window struct
    scan-locally (an explode by 4), then one hash-agg shuffle; the
    oracle reconstructs the same 4 epoch-aligned window starts."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("samples"), dsum("value", 4, "sum_value"))
        .select(F.col("w.start").alias("wstart"), "event_type",
                "samples", "sum_value"))


_AGG_TIME_SLIDING_SQL = f"""
WITH k AS (SELECT unnest(generate_series(0, 3)) AS k),
w AS (
  SELECT TIMESTAMP '1970-01-01 00:00:00'
           + to_seconds(CAST(floor(epoch(ts) / 900) * 900 - k * 900
                             AS BIGINT)) AS wstart,
         event_type, value
  FROM events CROSS JOIN k
)
SELECT wstart, event_type,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value
FROM w
GROUP BY 1, 2
"""


def _agg_pctl_from_hist(spark, sf_dir):
    """Re-aggregatable percentiles: exact quantiles don't merge, but
    fixed-width histogram partials do — per-day bin counts sum into
    the global histogram, and quantiles read off the cumulative
    counts.  The error is bounded by the bin width; the arithmetic
    (integer bins, integer ranks) is engine-exact, so this IS
    oracle-checkable, unlike sketch quantiles.  At 100 TB the daily
    partials are the materialized artifact; any window's percentile
    is a re-aggregation over bins-per-day rows, never raw data."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"),
                        F.floor(F.col("value") / F.lit(10.0)).alias("bin"))
             .agg(F.count("*").alias("n")))
    merged = daily.groupBy("bin").agg(F.sum("n").alias("n"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (merged.withColumn("cum", F.sum("n").over(w))
           .withColumn("total", F.sum("n").over(
               Window.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing))))
    return cum.agg(
        F.min(F.when(F.col("cum") >= F.ceil(F.col("total") * 0.5),
                     F.col("bin") * 10.0)).alias("p50_lo"),
        F.min(F.when(F.col("cum") >= F.ceil(F.col("total") * 0.95),
                     F.col("bin") * 10.0)).alias("p95_lo"),
        F.max("total").alias("n_values"))


_AGG_PCTL_FROM_HIST_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(floor(value / 10.0) AS BIGINT) AS bin,
         COUNT(*) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), merged AS (
  SELECT bin, SUM(n) AS n FROM daily GROUP BY 1
), cum AS (
  SELECT bin, n,
         SUM(n) OVER (ORDER BY bin) AS cum,
         SUM(n) OVER () AS total
  FROM merged
)
SELECT MIN(CASE WHEN cum >= CEIL(total * 0.5) THEN bin * 10.0 END)
         AS p50_lo,
       MIN(CASE WHEN cum >= CEIL(total * 0.95) THEN bin * 10.0 END)
         AS p95_lo,
       CAST(MAX(total) AS BIGINT) AS n_values
FROM cum
"""


def _agg_hll_reagg(spark, sf_dir):
    """OP-AGG-DISTINCT at scale: mergeable HLL sketch partials.
    Minerva's re-aggregation invariant (avg re-aggregates as
    SUM(sum)/SUM(samples)) extended to COUNT DISTINCT: daily sketch
    partials union losslessly into weekly estimates — the only way a
    distinct count re-aggregates at 100 TB without re-scanning raw
    data.  The merged path equals a direct weekly sketch exactly
    (same lgConfigK; HLL union is lossless — asserted in
    tests/test_properties.py).  Rows-only: DuckDB's approx_count_
    distinct uses a different sketch, so no SQL oracle exists."""
    ev = t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id").alias("sk")))
    return (daily
            .groupBy(F.date_trunc("week", "day").alias("week"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .alias("approx_users"))
            .orderBy("week"))


def _agg_salted_hot_keys(spark, sf_dir):
    """Skew-resilient aggregation (operators/skew.py): events grouped
    by event_type — 5 pathologically hot keys.  Two-phase salted
    aggregation fans each hot key over 32 reducers; the decimal
    partials make the salted result bit-identical to the plain
    GROUP BY the oracle runs."""
    from ..operators.skew import salted_agg
    ev = t(spark, sf_dir, "events")
    out = salted_agg(ev, ["event_type"], 32, {
        "samples": (F.count("*"), F.sum("samples")),
        "sum_value": (F.sum(F.col("value").cast("decimal(28,4)")),
                      F.sum("sum_value")),
        "max_value": (F.max("value"), F.max("max_value")),
    })
    return out.withColumn("sum_value", F.col("sum_value").cast("double"))


_AGG_SALTED_SQL = f"""
SELECT event_type,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1
"""


def _agg_busy_hour(spark, sf_dir):
    """Telecom busy-hour profile: for each user, the UTC hour-of-day
    with the highest mean value (tie → earliest hour).  Hour-of-day is
    INTEGER arithmetic on the epoch (``(s // 3600) % 24``) — identical
    in any engine under any session timezone, which is the whole
    determinism story for calendar profiles."""
    ev = t(spark, sf_dir, "events")
    hod = ((F.unix_micros("ts") / F.lit(1_000_000)).cast("bigint")
           / F.lit(3600)).cast("bigint") % 24
    per = (ev.groupBy("user_id", hod.alias("busy_hour"))
           .agg(F.count("*").alias("samples"),
                dsum("value").alias("__s")))
    avg = (F.col("__s") / F.col("samples").cast("double"))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("avg_value"), F.asc("busy_hour"))
    return (per.select("user_id", "busy_hour", "samples",
                       avg.alias("avg_value"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


_AGG_BUSY_HOUR_SQL = f"""
WITH a AS (
  SELECT user_id,
         (epoch_us(ts) // 1000000 // 3600) % 24 AS busy_hour,
         COUNT(*) AS samples,
         {oracle_dsum('value')} / CAST(COUNT(*) AS DOUBLE) AS avg_value
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
             ORDER BY avg_value DESC, busy_hour ASC) AS rn
  FROM a
)
SELECT user_id, busy_hour, samples, avg_value FROM r WHERE rn = 1
"""


def _agg_time_localtz(spark, sf_dir):
    """Calendar bucketing in a DEPLOYMENT timezone (Minerva's telecom
    stores aggregate per local day, not UTC day): UTC event times are
    shifted to Europe/Amsterdam wall time and truncated to the local
    day.  The conversion runs on TIMESTAMP_NTZ with explicit source
    and target zones (``convert_timezone('UTC', zone, ntz)``) so the
    result is independent of the Spark session timezone — the raw
    fixture's µs-NTZ ``ts`` is read directly (bypassing the
    registry's NTZ→UTC cast ON PURPOSE; the oracle mirrors with
    ``timezone(zone, timezone('UTC', ts))``)."""
    from ..registry import table_path

    ev = spark.read.parquet(table_path(sf_dir, "events"))
    local = F.expr("convert_timezone('UTC', 'Europe/Amsterdam', ts)")
    return (ev.select("user_id", "value",
                      F.date_trunc("day", local).cast("timestamp_ntz")
                      .alias("local_day"))
            .groupBy("user_id", "local_day")
            .agg(F.count("*").alias("samples"),
                 dsum("value").alias("sum_value")))


_AGG_TIME_LOCALTZ_SQL = f"""
SELECT user_id,
       date_trunc('day', timezone('Europe/Amsterdam',
                                  timezone('UTC', ts))) AS local_day,
       COUNT(*) AS samples,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


QUERIES = [
    DeclaredQuery("agg_time_sliding", _agg_time_sliding, _AGG_TIME_SLIDING_SQL, "OP-AGG-TIME (hopping)"),
    DeclaredQuery("agg_time_1h", _agg_time_1h, _AGG_TIME_1H_SQL, "OP-AGG-TIME"),
    DeclaredQuery("agg_time_15m", _agg_time_15m, _AGG_TIME_15M_SQL, "OP-AGG-TIME"),
    DeclaredQuery("agg_time_1d", _agg_time_1d, _AGG_TIME_1D_SQL, "OP-AGG-TIME"),
    DeclaredQuery("agg_time_1month", _agg_time_1month, _AGG_TIME_1MONTH_SQL, "OP-AGG-TIME"),
    DeclaredQuery("agg_busy_hour", _agg_busy_hour, _AGG_BUSY_HOUR_SQL, "OP-AGG-TIME (busy-hour profile)"),
    DeclaredQuery("agg_time_localtz", _agg_time_localtz, _AGG_TIME_LOCALTZ_SQL, "OP-AGG-TIME (deployment-timezone calendar)"),
    DeclaredQuery("agg_time_1w", _agg_time_1w, _AGG_TIME_1W_SQL, "OP-AGG-TIME"),
    DeclaredQuery("agg_reagg_avg", _agg_reagg_avg, _AGG_REAGG_AVG_SQL, "OP-AGG-PARTIAL"),
    DeclaredQuery("agg_count_distinct", _agg_count_distinct, _AGG_COUNT_DISTINCT_SQL, "OP-AGG-DISTINCT"),
    DeclaredQuery("agg_approx_distinct", _agg_approx_distinct, None, "OP-AGG-DISTINCT"),
    DeclaredQuery("agg_hll_reagg", _agg_hll_reagg, None, "OP-AGG-DISTINCT/OP-AGG-PARTIAL (mergeable sketches)"),
    DeclaredQuery("agg_pctl_from_hist", _agg_pctl_from_hist, _AGG_PCTL_FROM_HIST_SQL, "OP-AGG-PARTIAL (mergeable histogram quantiles)"),
    DeclaredQuery("agg_conditional", _agg_conditional, _AGG_CONDITIONAL_SQL, "OP-AGG-FILTER"),
    DeclaredQuery("agg_time_weighted_avg", _agg_time_weighted_avg, _AGG_TIME_WEIGHTED_AVG_SQL, "OP-AGG (time-weighted average)"),
    DeclaredQuery("agg_user_growth", _agg_user_growth, _AGG_USER_GROWTH_SQL, "OP-AGG (growth accounting)"),
    DeclaredQuery("agg_arg_extremes", _agg_arg_extremes, _AGG_ARG_EXTREMES_SQL, "OP-AGG (argmin/argmax)"),
    DeclaredQuery("agg_mode", _agg_mode, _AGG_MODE_SQL, "OP-AGG (mode / most-frequent)"),
    DeclaredQuery("agg_percentiles", _agg_percentiles, _AGG_PERCENTILES_SQL, "OP-AGG (percentiles)"),
    DeclaredQuery("agg_variance_exact", _agg_variance_exact, _AGG_VARIANCE_EXACT_SQL, "OP-AGG (variance)"),
    DeclaredQuery("agg_string_concat", _agg_string_concat, _AGG_STRING_CONCAT_SQL, "OP-AGG (string agg)"),
    DeclaredQuery("agg_corr_exact", _agg_corr_exact, _AGG_CORR_EXACT_SQL, "OP-AGG (correlation)"),
    DeclaredQuery("agg_histogram", _agg_histogram, _AGG_HISTOGRAM_SQL, "OP-AGG (histogram)"),
    DeclaredQuery("agg_salted_hot_keys", _agg_salted_hot_keys, _AGG_SALTED_SQL, "OP-AGG-TIME (skew/salting)"),
    DeclaredQuery("gap_detect", _gap_detect, _GAP_DETECT_SQL, "OP-JOIN-ANTI/OP-F-DATE (gap detection)"),
    DeclaredQuery("gap_fill", _gap_fill, _GAP_FILL_SQL, "OP-AGG-TIME (gap fill / carry-forward)"),
    DeclaredQuery("gap_interpolate", _gap_interpolate, _GAP_INTERPOLATE_SQL, "OP-AGG-TIME (gap fill / linear interpolation)"),
    DeclaredQuery("agg_cube", _agg_cube, _AGG_CUBE_SQL, "OP-GROUPSETS (CUBE)"),
    DeclaredQuery("seq_gap_ranges", _seq_gap_ranges, _SEQ_GAP_RANGES_SQL, "OP-AGG (id-sequence integrity)"),
    DeclaredQuery("agg_rollup_sets", _agg_rollup_sets, _AGG_ROLLUP_SETS_SQL, "OP-GROUPSETS"),
]


def _agg_moments(spark, sf_dir):
    """Exact higher-moment statistics (skewness, excess kurtosis) per
    class, from decimal power sums Σx..Σx⁴ — built-in skewness() /
    kurtosis() differ across engines in both summation order and
    sample-adjustment convention, so both sides compute the identical
    population (g1, g2) formula over exact partials.  One map-side
    combinable hash agg; power sums are mergeable, so this re-aggs
    across partitions/granularities the same way Σ/count do."""
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    n = F.count("value").cast("double")
    s1 = F.sum(v.cast("decimal(28,4)")).cast("double")
    s2 = F.sum((v * v).cast("decimal(38,6)")).cast("double")
    s3 = F.sum((v * v * v).cast("decimal(38,6)")).cast("double")
    s4 = F.sum((v * v * v * v).cast("decimal(38,6)")).cast("double")
    agg = ev.groupBy("event_type").agg(
        n.alias("n"), s1.alias("s1"), s2.alias("s2"),
        s3.alias("s3"), s4.alias("s4"))
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = (F.col("s3") / F.col("n")
          - F.lit(3.0) * mean * (F.col("s2") / F.col("n"))
          + F.lit(2.0) * mean * mean * mean)
    m4 = (F.col("s4") / F.col("n")
          - F.lit(4.0) * mean * (F.col("s3") / F.col("n"))
          + F.lit(6.0) * mean * mean * (F.col("s2") / F.col("n"))
          - F.lit(3.0) * mean * mean * mean * mean)
    # 9-dp round: DuckDB's hugeint-decimal -> double cast is doubly
    # rounded (value/10^scale), off by 1 ulp from Spark's correctly
    # rounded BigDecimal cast for wide s4 sums — same note as
    # agg_time_weighted_avg.
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("samples"),
        F.round(m3 / (m2 * F.sqrt(m2)), 9).alias("skewness"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 9).alias("kurtosis"))


_AGG_MOMENTS_SQL = """
WITH p AS (
  SELECT event_type,
         CAST(COUNT(value) AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(value * value * value AS DECIMAL(38,6)))
              AS DOUBLE) AS s3,
         CAST(SUM(CAST(value * value * value * value AS DECIMAL(38,6)))
              AS DOUBLE) AS s4
  FROM events GROUP BY 1
),
m AS (
  SELECT event_type, CAST(n AS BIGINT) AS samples,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3.0 * (s1 / n) * (s2 / n)
           + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4.0 * (s1 / n) * (s3 / n)
           + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM p
)
SELECT event_type, samples,
       ROUND(m3 / (m2 * sqrt(m2)), 9) AS skewness,
       ROUND(m4 / (m2 * m2) - 3.0, 9) AS kurtosis
FROM m
"""


QUERIES.append(
    DeclaredQuery("agg_moments", _agg_moments, _AGG_MOMENTS_SQL,
                  "OP-AGG (exact skewness/kurtosis from mergeable power sums)"))


def _agg_activity_bitmap(spark, sf_dir):
    """Bitmap-encoded activity (ClickHouse-style retention input): one
    BIGINT per user whose bit d is set iff the user was active on day
    d of the 63-day window from 2024-01-01.  BIT_OR of single-bit
    words is fully mergeable (map-side combinable, re-aggs across
    partials/granularities), turns day-level presence into one long
    per entity — 8 bytes of state instead of a (user, day) pair table
    — and downstream retention reads become bit tests (day-0 cohort
    retained on day 7 = two AND masks, no join)."""
    ev = t(spark, sf_dir, "events")
    day = F.floor(
        (F.unix_micros(F.col("ts")) - F.lit(1_704_067_200_000_000))
        / F.lit(86_400_000_000)).cast("int")
    bits = (ev.select("user_id", day.alias("d"))
            .filter((F.col("d") >= 0) & (F.col("d") < 63))
            .groupBy("user_id")
            .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), d))")
                 .alias("bitmap")))
    return bits.select(
        "user_id", "bitmap",
        F.bit_count("bitmap").cast("int").alias("n_active_days"),
        (F.col("bitmap").bitwiseAND(F.lit(1)) != 0).alias("active_day0"),
        ((F.col("bitmap").bitwiseAND(F.lit(1)) != 0)
         & (F.col("bitmap").bitwiseAND(F.lit(1 << 7)) != 0))
        .alias("retained_day7"))


_AGG_ACTIVITY_BITMAP_SQL = """
WITH d AS (
  SELECT user_id,
         CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000)
                    / 86400000000) AS INTEGER) AS d
  FROM events
),
b AS (
  SELECT user_id,
         bit_or(CAST(1 AS BIGINT) << d) AS bitmap
  FROM d WHERE d >= 0 AND d < 63
  GROUP BY 1
)
SELECT user_id, bitmap,
       CAST(bit_count(bitmap) AS INTEGER) AS n_active_days,
       (bitmap & 1) <> 0 AS active_day0,
       (bitmap & 1) <> 0 AND (bitmap & 128) <> 0 AS retained_day7
FROM b
"""


QUERIES.append(
    DeclaredQuery("agg_activity_bitmap", _agg_activity_bitmap,
                  _AGG_ACTIVITY_BITMAP_SQL,
                  "OP-AGG-PARTIAL (mergeable activity bitmaps / bit-test retention)"))


def _agg_gini(spark, sf_dir):
    """Gini coefficient of the value distribution per class — the
    skew-inequality number behind "1% of entities emit 60% of rows".
    Sort-based identity G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n over a
    total order (value, event_id).  Σ(rank·x) is decimal-staged (the
    per-class window + agg share one shuffle); rank·value products
    stay exact so both engines agree bit-for-bit before one final
    double expression, rounded at 9 dp for the hugeint-cast note."""
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("event_type")
         .orderBy(F.col("value").asc(), F.col("event_id").asc()))
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(w).cast("double").alias("rk"))
    agg = (ranked.groupBy("event_type")
           .agg(F.count("*").cast("double").alias("n"),
                F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                .alias("sv"),
                F.sum((F.col("rk") * F.col("value")).cast("decimal(38,4)"))
                .cast("double").alias("srx")))
    gini = (F.lit(2.0) * F.col("srx") / (F.col("n") * F.col("sv"))
            - (F.col("n") + F.lit(1.0)) / F.col("n"))
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("samples"),
        F.round(gini, 9).alias("gini"))


_AGG_GINI_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY value ASC, event_id ASC)
              AS DOUBLE) AS rk
  FROM events
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sv,
         CAST(SUM(CAST(rk * value AS DECIMAL(38,4))) AS DOUBLE) AS srx
  FROM ranked GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS samples,
       ROUND(2.0 * srx / (n * sv) - (n + 1.0) / n, 9) AS gini
FROM agg
"""


QUERIES.append(
    DeclaredQuery("agg_gini", _agg_gini, _AGG_GINI_SQL,
                  "OP-AGG (Gini inequality coefficient)"))


def _agg_navigated_1d(spark, sf_dir):
    """Aggregate navigation end-to-end: the daily KPI answered from
    the coarsest usable materialized store (the navigator picks the
    1h store over the 15m one; both are built here from the facts —
    in production they are the persisted materialization chain), then
    re-aggregated with the partial algebra.  Equals the direct 1d
    aggregation exactly — the oracle IS the direct form — while
    touching store-cardinality input instead of raw rows
    (plans/navigator.py)."""
    from ..plans.instance import Trend, TrendStorePart, aggregate_time
    from ..plans.navigator import navigate

    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", "value", F.col("value").alias("peak"))
    part = TrendStorePart("kpis", (
        Trend("value", time_aggregation="sum"),
        Trend("peak", time_aggregation="max"),
    ))
    stores = {
        "15m": aggregate_time(ev, part, "user_id", "ts", "15m"),
        "1h": aggregate_time(ev, part, "user_id", "ts", "1h"),
    }
    chosen, routed = navigate(stores, "1d", part, "user_id", "ts")
    if chosen != "1h":  # not assert: must survive python -O
        raise RuntimeError(
            f"navigator routed 1d re-agg to {chosen!r}, expected the "
            "coarsest nesting store '1h' — navigator regression")
    return routed.select(
        "user_id", F.col("ts").alias("day"),
        F.col("value").cast("double").alias("sum_value"),
        F.col("peak").alias("max_value"),
        F.col("samples"))


_AGG_NAVIGATED_1D_SQL = """
SELECT user_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       MAX(value) AS max_value,
       COUNT(*) AS samples
FROM events
GROUP BY 1, 2
"""


QUERIES.append(
    DeclaredQuery("agg_navigated_1d", _agg_navigated_1d,
                  _AGG_NAVIGATED_1D_SQL,
                  "OP-AGG-PARTIAL/OP-MAT (aggregate navigation)"))


_BENFORD = {
    1: 0.3010299957, 2: 0.1760912591, 3: 0.1249387366,
    4: 0.0969100130, 5: 0.0791812460, 6: 0.0669467896,
    7: 0.0579919470, 8: 0.0511525224, 9: 0.0457574906,
}


def _agg_benford(spark, sf_dir):
    """Benford first-significant-digit audit per class — the
    data-quality / fabrication screen: observed first-digit shares
    vs the Benford expectation, with the absolute deviation.  The
    expected shares are PRECOMPUTED literals (no engine log — the
    one source of cross-engine drift a log-based formulation would
    have); the first digit comes from the decimal string, so the op
    is one scan-local projection + one tiny hash agg."""
    ev = t(spark, sf_dir, "events").filter(F.col("value") >= 1.0)
    digit = F.substring(F.col("value").cast("string"), 1, 1).cast("int")
    counts = (ev.groupBy("event_type", digit.alias("first_digit"))
              .agg(F.count("*").alias("n")))
    w_tot = F.sum("n").over(Window.partitionBy("event_type"))
    expected = F.element_at(
        F.create_map(*[F.lit(x) for kv in _BENFORD.items() for x in kv]),
        F.col("first_digit"))
    share = F.col("n").cast("double") / F.col("total").cast("double")
    return (counts.withColumn("total", w_tot)
            .select("event_type", "first_digit", "n",
                    F.round(share, 9).alias("observed_share"),
                    F.round(F.abs(share - expected), 9)
                    .alias("benford_abs_dev")))


def _benford_sql() -> str:
    pairs = ", ".join(f"({d}, {p!r})" for d, p in _BENFORD.items())
    return f"""
WITH ev AS (SELECT * FROM events WHERE value >= 1.0),
counts AS (
  SELECT event_type,
         CAST(substring(CAST(value AS VARCHAR), 1, 1) AS INTEGER)
           AS first_digit,
         COUNT(*) AS n
  FROM ev GROUP BY 1, 2
),
exp_t(first_digit, expected) AS (VALUES {pairs}),
tot AS (
  SELECT *, SUM(n) OVER (PARTITION BY event_type) AS total
  FROM counts
)
SELECT t.event_type, t.first_digit, t.n,
       ROUND(CAST(t.n AS DOUBLE) / CAST(t.total AS DOUBLE), 9)
         AS observed_share,
       ROUND(abs(CAST(t.n AS DOUBLE) / CAST(t.total AS DOUBLE)
                 - e.expected), 9) AS benford_abs_dev
FROM tot t JOIN exp_t e ON t.first_digit = e.first_digit
"""


QUERIES.append(
    DeclaredQuery("agg_benford", _agg_benford, _benford_sql(),
                  "OP-AGG (Benford first-digit audit, literal expectation)"))


def _agg_weighted_median(spark, sf_dir):
    """Exact weighted median: the smallest extended price whose
    cumulative quantity reaches half the group's total — neither
    engine has a weighted quantile built-in, so both compute the
    identical crossing formulation: order by (value, tiebreak),
    running decimal weight sum, pick the first row crossing half.
    One window + one argmin-style agg per group; integer/decimal
    arithmetic end to end, so the crossing row is engine-exact."""
    li = t(spark, sf_dir, "lineitem")
    w = (Window.partitionBy("l_returnflag")
         .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy("l_returnflag")
    qty = F.col("l_quantity").cast("decimal(28,4)")
    cum = F.sum(qty).over(w)
    total = F.sum(qty).over(tot)
    crossed = (li.select("l_returnflag", "l_extendedprice",
                         cum.alias("cum"), total.alias("total"))
               .filter(F.col("cum") * 2 >= F.col("total")))
    return (crossed.groupBy("l_returnflag")
            .agg(F.min("l_extendedprice").alias("weighted_median_price"),
                 F.max(F.col("total")).cast("double").alias("total_qty")))


_AGG_WEIGHTED_MEDIAN_SQL = """
WITH c AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(28,4)))
           OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(l_quantity AS DECIMAL(28,4)))
           OVER (PARTITION BY l_returnflag) AS total
  FROM lineitem
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median_price,
       CAST(MAX(total) AS DOUBLE) AS total_qty
FROM c WHERE cum * 2 >= total
GROUP BY 1
"""


QUERIES.append(
    DeclaredQuery("agg_weighted_median", _agg_weighted_median,
                  _AGG_WEIGHTED_MEDIAN_SQL,
                  "OP-AGG (exact weighted median via cumulative crossing)"))


def _agg_churn_rate(spark, sf_dir):
    """Weekly churn accounting: per week, users active the PREVIOUS
    week split into retained (active again) and churned (gone) —
    the complement of agg_user_growth's new/active view.  Distinct
    (user, week) pairs are the mergeable partial (one shuffle);
    churn is a self-join of the pair table against week+1 — pair
    cardinality, never fact cardinality."""
    ev = t(spark, sf_dir, "events")
    wk = (ev.select("user_id",
                    F.date_trunc("week", "ts").alias("week"))
          .distinct())
    nxt = wk.select(F.col("user_id").alias("n_user"),
                    F.col("week").alias("n_week"))
    j = wk.join(
        nxt,
        (wk.user_id == nxt.n_user)
        & (nxt.n_week == F.col("week") + F.expr("INTERVAL 7 DAYS")),
        "left")
    per = (j.groupBy("week")
           .agg(F.count("*").alias("active"),
                F.count("n_user").alias("retained")))
    return per.select(
        "week", "active", "retained",
        (F.col("active") - F.col("retained")).alias("churned"),
        F.round(F.col("retained").cast("double")
                / F.col("active").cast("double"), 9)
        .alias("retention_rate"))


_AGG_CHURN_RATE_SQL = """
WITH wk AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
),
j AS (
  SELECT a.week, a.user_id, b.user_id AS n_user
  FROM wk a LEFT JOIN wk b
    ON a.user_id = b.user_id AND b.week = a.week + INTERVAL 7 DAY
)
SELECT week, COUNT(*) AS active, COUNT(n_user) AS retained,
       COUNT(*) - COUNT(n_user) AS churned,
       ROUND(CAST(COUNT(n_user) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS retention_rate
FROM j GROUP BY 1
"""


def _agg_retention_curve(spark, sf_dir):
    """Day-offset retention curve: of the users active on their own
    FIRST day, the share active again exactly D days later, for
    D in (1, 7, 14) — the D1/D7/D14 dashboard.  Distinct (user, day)
    pairs once; first day per user; then one join per offset against
    the pair table (pair cardinality).  Counts are exact."""
    ev = t(spark, sf_dir, "events")
    days = (ev.select("user_id", F.date_trunc("day", "ts").alias("d"))
            .distinct())
    first = days.groupBy("user_id").agg(F.min("d").alias("d0"))
    out = None
    for off in (1, 7, 14):
        probe = first.join(
            days.select(F.col("user_id").alias("p_user"),
                        F.col("d").alias("p_d")),
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_d") == F.col("d0")
               + F.expr(f"INTERVAL {off} DAYS")),
            "left")
        row = probe.agg(
            F.lit(off).cast("int").alias("day_offset"),
            F.count("*").alias("cohort"),
            F.count("p_user").alias("retained"),
            F.round(F.count("p_user").cast("double")
                    / F.count("*").cast("double"), 9)
            .alias("retention"))
        out = row if out is None else out.unionByName(row)
    return out


_AGG_RETENTION_CURVE_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
),
first AS (SELECT user_id, MIN(d) AS d0 FROM days GROUP BY 1),
offsets(day_offset) AS (VALUES (1), (7), (14))
SELECT o.day_offset,
       COUNT(*) AS cohort,
       COUNT(p.user_id) AS retained,
       ROUND(CAST(COUNT(p.user_id) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS retention
FROM first f
CROSS JOIN offsets o
LEFT JOIN days p
  ON p.user_id = f.user_id
 AND p.d = f.d0 + to_days(o.day_offset)
GROUP BY 1
"""


QUERIES.extend([
    DeclaredQuery("agg_churn_rate", _agg_churn_rate, _AGG_CHURN_RATE_SQL, "OP-AGG (weekly churn accounting)"),
    DeclaredQuery("agg_retention_curve", _agg_retention_curve, _AGG_RETENTION_CURVE_SQL, "OP-AGG (D1/D7/D14 retention curve)"),
])
