"""Declared queries: window functions (SURVEY.md §2.5) and the as-of
join — the attribute-store family plus analytic windows.

The orders table plays the attribute-history role (o_custkey=entity,
o_orderdate=validity timestamp, o_orderstatus=attribute), matching the
reference's SCD shape.  All windows partition on the entity key: one
shuffle, then narrow.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.attribute import change_detect, compact, curr_view
from ..operators.joins import asof_join
from .base import DeclaredQuery, t


def _attr_curr(spark, sf_dir):
    """OP-WIN-LATEST: attribute curr-view — latest order per customer."""
    orders = t(spark, sf_dir, "orders")
    return curr_view(
        orders, key=["o_custkey"], order=["o_orderdate", "o_orderkey"],
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus",
             "o_totalprice")


_ATTR_CURR_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus, o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


def _attr_change_detect(spark, sf_dir):
    """OP-WIN-CHANGE: keep rows whose attribute hash differs from the
    previous row (the reference's store-only-on-change rule)."""
    orders = t(spark, sf_dir, "orders")
    return change_detect(
        orders, key=["o_custkey"], order=["o_orderdate", "o_orderkey"],
        attr_cols=["o_orderstatus"],
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")


_ATTR_CHANGE_DETECT_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus
FROM (
  SELECT *, LAG(o_orderstatus) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS prev_status
  FROM orders
) WHERE prev_status IS NULL OR o_orderstatus <> prev_status
"""


def _attr_compact(spark, sf_dir):
    """OP-WIN-COMPACT: collapse consecutive equal-status runs into
    validity ranges (entity, status, ts_start, ts_end, n_rows)."""
    orders = t(spark, sf_dir, "orders")
    return compact(
        orders, key=["o_custkey"], ts_col="o_orderdate",
        order=["o_orderdate", "o_orderkey"], attr_cols=["o_orderstatus"],
    ).select("o_custkey", "o_orderstatus", "ts_start", "ts_end", "n_rows")


_ATTR_COMPACT_SQL = """
WITH flagged AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
         CASE WHEN LAG(o_orderstatus) OVER w IS NULL
                OR o_orderstatus <> LAG(o_orderstatus) OVER w
              THEN 1 ELSE 0 END AS changed
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT *, SUM(changed) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM flagged
)
SELECT o_custkey, o_orderstatus,
       MIN(o_orderdate) AS ts_start, MAX(o_orderdate) AS ts_end,
       COUNT(*) AS n_rows
FROM runs GROUP BY o_custkey, run, o_orderstatus
"""


def _win_rank_topn(spark, sf_dir):
    """OP-WIN-RANK: top-3 customers by balance per nation, total order."""
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return (cust.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= 3)
            .select("c_nationkey", "rn", "c_custkey", "c_acctbal"))


_WIN_RANK_TOPN_SQL = """
SELECT c_nationkey, CAST(rn AS BIGINT) AS rn, c_custkey, c_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn <= 3
"""


def _win_delta_prev(spark, sf_dir):
    """OP-WIN-ANALYTIC: counter delta vs previous period — the
    rate-from-cumulative-counter pattern of Minerva instances."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"))


_WIN_DELTA_PREV_SQL = """
SELECT event_id, user_id, value,
       value - LAG(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS delta
FROM events
"""


def _win_counter_rate(spark, sf_dir):
    """OP-WIN-ANALYTIC (counter-reset form): rate from a cumulative
    counter with wrap/reset detection — the telecom PM pattern the
    reference's KPI instances compute.  A negative delta means the
    counter reset (node restart); the rate is then the raw value (the
    counter restarted from zero), matching the PM convention."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    rate = F.when(delta < 0, F.col("value")).otherwise(delta)
    return ev.select("event_id", "user_id", "value",
                     delta.alias("delta"), rate.alias("rate"))


_WIN_COUNTER_RATE_SQL = """
SELECT event_id, user_id, value,
       value - prev AS delta,
       CASE WHEN value - prev < 0 THEN value ELSE value - prev END AS rate
FROM (
  SELECT event_id, user_id, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
"""


def _win_moving_avg(spark, sf_dir):
    """OP-WIN-MOVAVG: 4-row sliding mean per entity (decimal-exact
    frame sum / frame count, then one double division)."""
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-3, 0))
    mov_sum = F.sum(F.col("value").cast("decimal(28,4)")).over(w).cast("double")
    mov_n = F.count("value").over(w)
    return ev.select(
        "event_id", "user_id", "value",
        (mov_sum / mov_n.cast("double")).alias("mov_avg"),
        mov_n.alias("mov_n"))


_WIN_MOVING_AVG_SQL = """
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE)
         / CAST(COUNT(value) OVER w AS DOUBLE) AS mov_avg,
       COUNT(value) OVER w AS mov_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def _join_asof(spark, sf_dir):
    """OP-JOIN-ASOF: for each click, the value of the user's latest
    purchase at-or-before the click (attribute value valid at fact
    time).  Union-tag + running last(ignorenulls) — see
    operators/joins.py for why this beats a range join at scale."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("asof_value"))
    return asof_join(
        clicks, purchases, key=["user_id"], ts_col="ts",
        attr_cols=["asof_value"],
    ).select("event_id", "user_id", "value", "asof_value")


# ts is truncated to µs in BOTH CTEs so the asof inequality compares
# exactly what Spark compares (parquet ns -> µs, FIXTURES.md hazard)
_JOIN_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
         value AS asof_value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, c.value, p.asof_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def _join_asof_forward(spark, sf_dir):
    """OP-JOIN-ASOF (forward): for each click, the user's NEXT purchase
    at-or-after the click — time-to-conversion semantics.  Purchases
    collapse to one row per (user, ts) first so nearest-row ties
    cannot arise (engines may break them differently)."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.max("value").alias("next_value")))
    return asof_join(
        clicks, purchases, key=["user_id"], ts_col="ts",
        attr_cols=["next_value"], direction="forward",
    ).select("event_id", "user_id", "value", "next_value")


_JOIN_ASOF_FORWARD_SQL = """
WITH clicks AS (
  SELECT event_id, user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
         MAX(value) AS next_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.value, p.next_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


def _win_time_range_avg(spark, sf_dir):
    """OP-WIN-MOVAVG (time-based RANGE frame): per-entity mean over
    the trailing 1-hour event-time window — the frame is defined by
    TIME distance, not row count, so bursty and sparse entities get
    the same semantics.  The order key is integer epoch seconds
    (identical RANGE arithmetic in both engines); decimal frame sums
    keep the division bit-exact."""
    ev = t(spark, sf_dir, "events").withColumn(
        "ts_s", (F.unix_micros("ts") / F.lit(1_000_000)).cast("bigint"))
    w = (Window.partitionBy("user_id").orderBy("ts_s")
         .rangeBetween(-3600, 0))
    rng_sum = (F.sum(F.col("value").cast("decimal(28,4)")).over(w)
               .cast("double"))
    rng_n = F.count("value").over(w)
    return ev.select(
        "event_id", "user_id", "value",
        (rng_sum / rng_n.cast("double")).alias("rng_avg"),
        rng_n.alias("rng_n"))


_WIN_TIME_RANGE_AVG_SQL = """
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE)
         / CAST(COUNT(value) OVER w AS DOUBLE) AS rng_avg,
       COUNT(value) OVER w AS rng_n
FROM (SELECT *, epoch_us(ts) // 1000000 AS ts_s FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def _join_asof_tolerance(spark, sf_dir):
    """OP-JOIN-ASOF (bounded staleness): latest purchase at-or-before
    each click, but only if it happened within the last hour — stale
    matches null out (pandas merge_asof tolerance semantics).  The cap
    is a scan-local filter after the same one-shuffle window pass."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("asof_value"))
    return asof_join(
        clicks, purchases, key=["user_id"], ts_col="ts",
        attr_cols=["asof_value"], tolerance_us=3_600_000_000,
    ).select("event_id", "user_id", "value", "asof_value")


_JOIN_ASOF_TOLERANCE_SQL = """
WITH clicks AS (
  SELECT event_id, user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
         value AS asof_value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, c.value,
       CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
            THEN p.asof_value END AS asof_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""



def _win_ratio_to_report(spark, sf_dir):
    """OP-WIN (ratio-to-report): each class's share of its user's
    total — the classic OLAP percent-of-total.  Numerator and
    denominator are decimal partials (denominator = window sum over
    the already-aggregated per-class rows, |classes| per user), so the
    single share division is the only float op."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    per_class = (ev.groupBy("user_id", "event_type")
                 .agg(F.sum(F.col("value").cast("decimal(28,4)"))
                      .alias("__sum")))
    w = Window.partitionBy("user_id")
    return per_class.select(
        "user_id", "event_type",
        F.col("__sum").cast("double").alias("class_value"),
        (F.col("__sum").cast("double")
         / F.sum("__sum").over(w).cast("double")).alias("share"))


_WIN_RATIO_TO_REPORT_SQL = """
WITH per_class AS (
  SELECT user_id, event_type,
         SUM(CAST(value AS DECIMAL(28,4))) AS s
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type,
       CAST(s AS DOUBLE) AS class_value,
       CAST(s AS DOUBLE)
         / CAST(SUM(s) OVER (PARTITION BY user_id) AS DOUBLE) AS share
FROM per_class
"""



def _win_rolling_zscore(spark, sf_dir):
    """OP-WIN x OP-TRIG (rolling baseline): z-score of each reading
    against its own TRAILING-20 window (self-adapting baseline vs the
    whole-history z of anomaly_zscore).  Frame sums are decimal (Σx,
    Σx² exact — a sliding double sum would drift between engines'
    add/remove strategies), then one shared double formula; rows with
    fewer than 5 trailing samples or zero variance emit NULL z."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-19, 0))
    s = F.sum(F.col("value").cast("decimal(28,4)")).over(w).cast("double")
    sq = F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)"))         .over(w).cast("double")
    n = F.count("value").over(w).cast("double")
    var = (sq - s * s / n) / (n - F.lit(1.0))
    z = F.when((n >= 5.0) & (var > 0.0),
               (F.col("value") - s / n) / F.sqrt(var))
    return ev.select("event_id", "user_id", "value",
                     n.cast("bigint").alias("n_window"),
                     z.alias("z"))


_WIN_ROLLING_ZSCORE_SQL = """
WITH f AS (
  SELECT event_id, user_id, value,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS s,
         CAST(SUM(CAST(value * value AS DECIMAL(28,6))) OVER w AS DOUBLE)
           AS sq,
         CAST(COUNT(value) OVER w AS DOUBLE) AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, value,
       CAST(n AS BIGINT) AS n_window,
       CASE WHEN n >= 5.0 AND (sq - s * s / n) / (n - 1.0) > 0.0
            THEN (value - s / n) / sqrt((sq - s * s / n) / (n - 1.0))
       END AS z
FROM f
"""



def _win_drawdown(spark, sf_dir):
    """OP-WIN (running-max drawdown): distance of each reading below
    its entity's running peak — the recovery/degradation readout for
    gauge KPIs.  Running max is pure comparison (no FP accumulation),
    one entity-partitioned sort."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run_max = F.max("value").over(w)
    return ev.select("event_id", "user_id", "value",
                     run_max.alias("run_max"),
                     (run_max - F.col("value")).alias("drawdown"))


_WIN_DRAWDOWN_SQL = """
SELECT event_id, user_id, value,
       MAX(value) OVER w AS run_max,
       MAX(value) OVER w - value AS drawdown
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _join_asof_nearest(spark, sf_dir):
    """OP-JOIN-ASOF (nearest-in-time): the purchase closest to each
    click in EITHER direction — compose the backward and forward
    passes (each one shuffle + one window) and pick the smaller
    absolute gap, ties to the backward match.  Purchases collapse per
    (user, ts) first so same-ts ties cannot differ across engines."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.max("value").alias("p_value"))
                 .select("user_id", "ts",
                         F.col("ts").alias("p_ts"), "p_value"))
    back = asof_join(clicks, purchases.select(
        "user_id", "ts", F.col("p_ts").alias("b_ts"),
        F.col("p_value").alias("b_value")),
        key=["user_id"], ts_col="ts", attr_cols=["b_ts", "b_value"])
    both = asof_join(back, purchases.select(
        "user_id", "ts", F.col("p_ts").alias("f_ts"),
        F.col("p_value").alias("f_value")),
        key=["user_id"], ts_col="ts", attr_cols=["f_ts", "f_value"],
        direction="forward")
    b_gap = F.unix_micros("ts") - F.unix_micros("b_ts")
    f_gap = F.unix_micros("f_ts") - F.unix_micros("ts")
    pick_back = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (b_gap <= f_gap))
    return both.select(
        "event_id", "user_id",
        F.when(pick_back, F.col("b_value")).otherwise(F.col("f_value"))
        .alias("nearest_value"),
        F.when(pick_back, -b_gap).otherwise(f_gap).alias("gap_us"))


_JOIN_ASOF_NEAREST_SQL = """
WITH clicks AS (
  SELECT event_id, user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
         MAX(value) AS p_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
b AS (
  SELECT c.event_id, c.user_id, c.ts,
         p.ts AS b_ts, p.p_value AS b_value
  FROM clicks c ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND c.ts >= p.ts
),
f AS (
  SELECT c.event_id, p.ts AS f_ts, p.p_value AS f_value
  FROM clicks c ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT b.event_id, b.user_id,
       CASE WHEN f.f_ts IS NULL
              OR (b.b_ts IS NOT NULL
                  AND epoch_us(b.ts) - epoch_us(b.b_ts)
                      <= epoch_us(f.f_ts) - epoch_us(b.ts))
            THEN b.b_value ELSE f.f_value END AS nearest_value,
       CASE WHEN f.f_ts IS NULL
              OR (b.b_ts IS NOT NULL
                  AND epoch_us(b.ts) - epoch_us(b.b_ts)
                      <= epoch_us(f.f_ts) - epoch_us(b.ts))
            THEN -(epoch_us(b.ts) - epoch_us(b.b_ts))
            ELSE epoch_us(f.f_ts) - epoch_us(b.ts) END AS gap_us
FROM b JOIN f ON b.event_id = f.event_id
"""



def _win_streaks(spark, sf_dir):
    """OP-WIN (gaps-and-islands): longest consecutive-active-day
    streak per user.  Island id = day minus the day's per-user rank
    (consecutive days share it); two hash aggs around one
    entity-partitioned window sort — the standard streak plan, linear
    per entity, no self-join."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.date_sub("d", F.row_number().over(w)))
    streaks = (isl.groupBy("user_id", "grp")
               .agg(F.count("*").alias("len")))
    return (streaks.groupBy("user_id")
            .agg(F.max("len").alias("max_streak"),
                 F.count("*").alias("n_streaks")))


_WIN_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS grp
  FROM days
),
s AS (SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id, MAX(len) AS max_streak, COUNT(*) AS n_streaks
FROM s GROUP BY 1
"""



QUERIES = [
    DeclaredQuery("win_rolling_zscore", _win_rolling_zscore, _WIN_ROLLING_ZSCORE_SQL, "OP-WIN x OP-TRIG (rolling z-score baseline)"),
    DeclaredQuery("win_ratio_to_report", _win_ratio_to_report, _WIN_RATIO_TO_REPORT_SQL, "OP-WIN (ratio-to-report)"),
    DeclaredQuery("win_streaks", _win_streaks, _WIN_STREAKS_SQL, "OP-WIN (gaps-and-islands streaks)"),
    DeclaredQuery("attr_curr", _attr_curr, _ATTR_CURR_SQL, "OP-WIN-LATEST"),
    DeclaredQuery("attr_change_detect", _attr_change_detect, _ATTR_CHANGE_DETECT_SQL, "OP-WIN-CHANGE"),
    DeclaredQuery("attr_compact", _attr_compact, _ATTR_COMPACT_SQL, "OP-WIN-COMPACT"),
    DeclaredQuery("win_rank_topn", _win_rank_topn, _WIN_RANK_TOPN_SQL, "OP-WIN-RANK"),
    DeclaredQuery("win_delta_prev", _win_delta_prev, _WIN_DELTA_PREV_SQL, "OP-WIN-ANALYTIC"),
    DeclaredQuery("win_counter_rate", _win_counter_rate, _WIN_COUNTER_RATE_SQL, "OP-WIN-ANALYTIC (counter reset)"),
    DeclaredQuery("win_moving_avg", _win_moving_avg, _WIN_MOVING_AVG_SQL, "OP-WIN-MOVAVG"),
    DeclaredQuery("win_time_range_avg", _win_time_range_avg, _WIN_TIME_RANGE_AVG_SQL, "OP-WIN-MOVAVG (time RANGE frame)"),
    DeclaredQuery("join_asof", _join_asof, _JOIN_ASOF_SQL, "OP-JOIN-ASOF"),
    DeclaredQuery("win_drawdown", _win_drawdown, _WIN_DRAWDOWN_SQL, "OP-WIN (running-max drawdown)"),
    DeclaredQuery("join_asof_nearest", _join_asof_nearest, _JOIN_ASOF_NEAREST_SQL, "OP-JOIN-ASOF (nearest either direction)"),
    DeclaredQuery("join_asof_tolerance", _join_asof_tolerance, _JOIN_ASOF_TOLERANCE_SQL, "OP-JOIN-ASOF (bounded staleness)"),
    DeclaredQuery("join_asof_forward", _join_asof_forward, _JOIN_ASOF_FORWARD_SQL, "OP-JOIN-ASOF (forward)"),
]


def _win_running_total(spark, sf_dir):
    """Cumulative counter per entity (Minerva's counters ARE cumulative
    in many vendors): running decimal-exact sum + running count."""
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(28,4)")).over(w).cast("double")
        .alias("running_sum"),
        F.count("*").over(w).alias("running_n"))


_WIN_RUNNING_TOTAL_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE)
         AS running_sum,
       COUNT(*) OVER w AS running_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _win_distribution(spark, sf_dir):
    """Distribution ranks per nation: percent_rank / cume_dist / ntile
    over a total order — all rational-count arithmetic, engine-exact."""
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"))


_WIN_DISTRIBUTION_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


def _win_first_last(spark, sf_dir):
    """first/last/nth value over a total-ordered full-partition frame:
    each entity's first order date, latest status, second order key."""
    orders = t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return orders.select(
        "o_orderkey", "o_custkey",
        F.first("o_orderdate").over(w).alias("first_date"),
        F.last("o_orderstatus").over(w).alias("latest_status"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"))


_WIN_FIRST_LAST_SQL = """
SELECT o_orderkey, o_custkey,
       first_value(o_orderdate) OVER w AS first_date,
       last_value(o_orderstatus) OVER w AS latest_status,
       nth_value(o_orderkey, 2) OVER w AS second_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def _win_next_event_gap(spark, sf_dir):
    """Time-to-next-event per entity (lead on integer microseconds —
    engine-portable; NULL for each entity's last event)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id", "user_id",
        (F.lead(micros).over(w) - micros).alias("gap_us"))


_WIN_NEXT_EVENT_GAP_SQL = """
SELECT event_id, user_id,
       LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
         - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


QUERIES.extend([
    DeclaredQuery("win_running_total", _win_running_total, _WIN_RUNNING_TOTAL_SQL, "OP-WIN-ANALYTIC (running)"),
    DeclaredQuery("win_distribution", _win_distribution, _WIN_DISTRIBUTION_SQL, "OP-WIN-RANK (distribution)"),
    DeclaredQuery("win_first_last", _win_first_last, _WIN_FIRST_LAST_SQL, "OP-WIN (first/last/nth)"),
    DeclaredQuery("win_next_event_gap", _win_next_event_gap, _WIN_NEXT_EVENT_GAP_SQL, "OP-WIN-ANALYTIC (lead)"),
])

def _event_transitions(spark, sf_dir):
    """Markov transition matrix over the event stream: for each
    (src → dst) consecutive event-type pair per user, the transition
    count and the number of distinct users making it.  One
    entity-partitioned window sort (lead), then one hash agg — the
    same shuffle key serves both, so the plan is sort + agg with a
    single exchange on user_id, then a second small exchange on the
    (src, dst) matrix (bounded by |event_type|²)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return (trans.groupBy("src", "dst")
            .agg(F.count("*").alias("n_transitions"),
                 F.countDistinct("user_id").alias("n_users")))


_EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst, COUNT(*) AS n_transitions,
       COUNT(DISTINCT user_id) AS n_users
FROM s WHERE dst IS NOT NULL
GROUP BY 1, 2
"""


def _win_ewma(spark, sf_dir):
    """Exponentially weighted moving average (alpha = 1/2, depth 8)
    per entity — the standard smoothing baseline for noisy gauges.

    Formulated as a bounded lag-chain (8 lag terms, weights 2^-d)
    rather than a recursive state fold: every weight is an exact
    binary power so each product is a pure exponent shift, and both
    engines sum the terms in the identical written order —
    bit-identical cross-engine without decimal staging.  The frame
    depth bounds the weight tail at 2^-7 (< 1% influence), the usual
    truncated-EWMA justification.  Plan: one entity-partitioned
    window sort shared by all 8 lags — single exchange, linear."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for d in range(8):
        lv = F.col("value") if d == 0 else F.lag("value", d).over(w)
        wt = F.lit(float(2.0 ** -d))
        term = F.when(lv.isNotNull(), lv * wt).otherwise(F.lit(0.0))
        pres = F.when(lv.isNotNull(), wt).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = pres if den is None else den + pres
    return ev.select("event_id", "user_id",
                     (num / den).alias("ewma"))


def _ewma_sql_terms() -> tuple[str, str]:
    nums, dens = [], []
    for d in range(8):
        lv = "value" if d == 0 else f"LAG(value, {d}) OVER w"
        wt = repr(float(2.0 ** -d))
        nums.append(f"CASE WHEN ({lv}) IS NOT NULL "
                    f"THEN ({lv}) * {wt} ELSE 0.0 END")
        dens.append(f"CASE WHEN ({lv}) IS NOT NULL "
                    f"THEN {wt} ELSE 0.0 END")
    return " + ".join(nums), " + ".join(dens)


_EWMA_NUM, _EWMA_DEN = _ewma_sql_terms()
_WIN_EWMA_SQL = f"""
SELECT event_id, user_id,
       ({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


QUERIES.extend([
    DeclaredQuery("event_transitions", _event_transitions, _EVENT_TRANSITIONS_SQL, "OP-WIN-CHANGE/OP-WIN-ANALYTIC (markov transitions)"),
    DeclaredQuery("win_ewma", _win_ewma, _WIN_EWMA_SQL, "OP-WIN-MOVAVG (exponential smoothing)"),
])


def _win_fill_forward(spark, sf_dir):
    """Forward-fill over an entity timeline (LAST_VALUE ... IGNORE
    NULLS): gauges dropping below the reporting floor (< 10 here,
    standing in for a sensor that skipped a reading) carry the last
    reported value forward.  IGNORE NULLS makes this one frame over
    one entity sort — no islands bookkeeping, no self-join; rows
    before the first reading stay NULL."""
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    reported = F.when(F.col("value") >= 10.0, F.col("value"))
    return ev.select(
        "event_id", "user_id",
        reported.alias("reported"),
        F.last(reported, ignorenulls=True).over(w).alias("filled"))


_WIN_FILL_FORWARD_SQL = """
SELECT event_id, user_id,
       CASE WHEN value >= 10.0 THEN value END AS reported,
       LAST_VALUE(CASE WHEN value >= 10.0 THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled
FROM events
"""


def _rolling_active_users(spark, sf_dir):
    """Rolling 7-day distinct active users per day — the DAU/WAU
    dashboard number.  Distinct counts don't slide, so the standard
    distributed form: collapse to distinct (user, day) pairs first
    (the small mergeable partial), fan each pair out to the 7 window
    days it supports (a 7× explode of the PAIR table, not the fact
    table), then one exact distinct count per window day.  Days with
    no activity in range simply don't appear (report joins a spine
    if it needs zeros)."""
    ev = t(spark, sf_dir, "events")
    pairs = (ev.select("user_id", F.date_trunc("day", "ts").alias("d"))
             .distinct())
    fanned = pairs.select(
        "user_id",
        F.explode(F.expr(
            "sequence(d, d + INTERVAL 6 DAYS, INTERVAL 1 DAY)"))
        .alias("window_day"))
    out = (fanned.groupBy("window_day")
           .agg(F.countDistinct("user_id").alias("active_users_7d")))
    # clip the fan-out tail past the observed range
    maxd = pairs.agg(F.max("d").alias("max_d"))
    return (out.crossJoin(F.broadcast(maxd))
            .filter(F.col("window_day") <= F.col("max_d"))
            .select("window_day", "active_users_7d"))


_ROLLING_ACTIVE_USERS_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
),
fanned AS (
  SELECT p.user_id, p.d + to_days(CAST(o.off AS INTEGER)) AS window_day
  FROM pairs p, (SELECT unnest(range(0, 7)) AS off) o
),
mx AS (SELECT MAX(d) AS max_d FROM pairs)
SELECT window_day, COUNT(DISTINCT user_id) AS active_users_7d
FROM fanned, mx
WHERE window_day <= max_d
GROUP BY 1
"""


QUERIES.extend([
    DeclaredQuery("win_fill_forward", _win_fill_forward, _WIN_FILL_FORWARD_SQL, "OP-WIN-LATEST (IGNORE NULLS forward fill)"),
    DeclaredQuery("rolling_active_users", _rolling_active_users, _ROLLING_ACTIVE_USERS_SQL, "OP-AGG-DISTINCT (rolling 7-day distinct actives)"),
])
