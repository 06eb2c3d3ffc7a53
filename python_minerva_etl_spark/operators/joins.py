"""Join operators beyond plain equi-joins — point-in-time (as-of) and
banded range joins.

Reference semantics (attribute_directory ``at_func`` usage via
attributestore [U]): the attribute value valid at a fact timestamp is
the latest history row with ``attr.ts <= fact.ts``.

Spark mapping (OP-JOIN-ASOF): union-tag + running ``last(ignorenulls)``
window, NOT a range join.  A range join on (key, attr.ts <= fact.ts)
produces O(facts × history-per-key) intermediate rows before the
per-fact max is taken; the union approach is a single shuffle on the
entity key and one linear pass per partition — at 100 TB this is the
difference between a working plan and a blown-up one.  (DuckDB's
native ASOF JOIN is the oracle twin.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(facts: DataFrame, history: DataFrame, key: list[str],
              ts_col: str, attr_cols: list[str],
              inclusive: bool = True,
              direction: str = "backward",
              tolerance_us: int | None = None) -> DataFrame:
    """For each fact row, attach ``attr_cols`` from the nearest history
    row per ``key``: the latest with ``history.ts <= fact.ts``
    (``direction="backward"``, the attribute-at-fact-time semantics)
    or the earliest with ``history.ts >= fact.ts``
    (``direction="forward"``, next-reading-after).  ``inclusive``
    controls whether equality counts.

    ``history`` must contain ``key + [ts_col] + attr_cols``; attr_cols
    must not collide with fact column names (rename before calling).
    Both directions are ONE shuffle on the entity key + one linear
    window pass — never a range join (O(facts × history-per-key)
    intermediates).

    ``tolerance_us`` caps staleness: a match further than that many
    microseconds from the fact is nulled out (the pandas
    ``merge_asof(tolerance=...)`` semantics) — applied scan-local
    after the window pass, so it costs nothing.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, "
                         f"got {direction!r}")
    backward = direction == "backward"
    # sort position of history rows vs fact rows at the SAME ts
    # encodes <= vs < (backward) and >= vs > (forward):
    #   backward inclusive:  history first  (in frame [start, current])
    #   forward  inclusive:  history after  (in frame [current, end])
    hist_first = inclusive if backward else not inclusive
    f = facts.withColumn("__is_fact", F.lit(1)) \
        .withColumn("__ord", F.lit(1 if hist_first else 0))
    # history attrs ride in ONE struct, non-null on every history row:
    # last/first(ignorenulls) then skips only fact-row filler, never a
    # genuinely-NULL attribute value inside the matched history row
    # __h_ts rides first in the struct: same-ts history rows share it,
    # so the duplicate-ts tiebreak (struct comparison) is unchanged
    h = history.select(
        *key, ts_col,
        F.struct(F.unix_micros(F.col(ts_col)).alias("__h_ts"),
                 *[F.col(c) for c in attr_cols]).alias("__attrs")
    ).withColumn("__is_fact", F.lit(0)) \
        .withColumn("__ord", F.lit(0 if hist_first else 1))
    unioned = f.unionByName(h, allowMissingColumns=True)
    # the struct is the final tiebreak so duplicate-ts history rows
    # resolve deterministically (max attrs win backward, min forward)
    w = Window.partitionBy(*key).orderBy(ts_col, "__ord", "__attrs")
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        picked = F.last("__attrs", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        picked = F.first("__attrs", ignorenulls=True).over(w)
    unioned = unioned.withColumn("__attrs", picked)
    out = unioned.filter(F.col("__is_fact") == 1)
    if tolerance_us is not None:
        gap = F.abs(F.unix_micros(F.col(ts_col))
                    - F.col("__attrs").getField("__h_ts"))
        out = out.withColumn(
            "__attrs", F.when(gap <= F.lit(int(tolerance_us)),
                              F.col("__attrs")))
    for c in attr_cols:
        out = out.withColumn(c, F.col("__attrs").getField(c))
    return out.drop("__is_fact", "__ord", "__attrs")


def range_join(left: DataFrame, right: DataFrame, key: list[str],
               left_ts: str, right_ts: str,
               lower_us: int, upper_us: int,
               lower_inclusive: bool = False,
               upper_inclusive: bool = True) -> DataFrame:
    """Banded range join (OP-JOIN-RANGE): pair rows sharing ``key``
    where ``right_ts - left_ts`` lies in the band
    ``[lower_us, upper_us]`` microseconds (bound inclusivity per the
    flags).  Column names must be pre-disambiguated (rename before
    calling); both ts columns must be timestamps.

    Catalyst plans a raw ``a.ts < b.ts AND b.ts <= a.ts + delta``
    condition as BroadcastNestedLoopJoin / cartesian — O(n*m) per key
    and a non-starter at 100 TB.  This instead buckets both sides into
    fixed windows of ``width = upper_us - lower_us`` (>= 1s) and
    equi-joins on (key, bucket): each left row can only match right
    rows in the 2 buckets spanned by ``[t+lower, t+upper]``, so the
    left side explodes to exactly <= 2 candidate rows, the join is a
    plain shuffled/broadcast hash join on (key, bucket), and the exact
    band predicate refines the candidates.  Work is O(matches +
    candidates-in-adjacent-buckets), one shuffle per side.
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must exceed lower_us")
    width = max(upper_us - lower_us, 1_000_000)
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    lo = l_us + F.lit(lower_us)
    hi = l_us + F.lit(upper_us)
    l = left.withColumn(
        "__bucket",
        F.explode(F.sequence(
            F.floor(lo / F.lit(width)), F.floor(hi / F.lit(width)))))
    r = right.withColumn("__bucket", F.floor(r_us / F.lit(width)))
    gap = (F.unix_micros(F.col(right_ts))
           - F.unix_micros(F.col(left_ts)))
    lo_pred = (gap >= F.lit(lower_us)) if lower_inclusive \
        else (gap > F.lit(lower_us))
    hi_pred = (gap <= F.lit(upper_us)) if upper_inclusive \
        else (gap < F.lit(upper_us))
    cond = l["__bucket"] == r["__bucket"]
    for k in key:
        cond = cond & (l[k] == r[k])
    joined = l.join(r, cond & lo_pred & hi_pred, "inner")
    for k in key:
        joined = joined.drop(r[k])
    return joined.drop(l["__bucket"]).drop(r["__bucket"])
