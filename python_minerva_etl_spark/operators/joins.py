"""Join operators beyond plain equi-joins — point-in-time (as-of).

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
              direction: str = "backward") -> DataFrame:
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
    h = history.select(
        *key, ts_col,
        F.struct(*[F.col(c) for c in attr_cols]).alias("__attrs")
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
    for c in attr_cols:
        out = out.withColumn(c, F.col("__attrs").getField(c))
    return out.drop("__is_fact", "__ord", "__attrs")
