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
              inclusive: bool = True) -> DataFrame:
    """For each fact row, attach the latest ``attr_cols`` from history
    with ``history.ts <= fact.ts`` (inclusive) per ``key``.

    ``history`` must contain ``key + [ts_col] + attr_cols``; attr_cols
    must not collide with fact column names (rename before calling).
    """
    f = facts.withColumn("__is_fact", F.lit(1 if inclusive else 0))
    # history attrs ride in ONE struct, non-null on every history row:
    # last(ignorenulls) then skips only fact-row filler, never a
    # genuinely-NULL attribute value inside the latest history row
    h = history.select(
        *key, ts_col,
        F.struct(*[F.col(c) for c in attr_cols]).alias("__attrs")
    ).withColumn("__is_fact", F.lit(0 if inclusive else 1))
    unioned = f.unionByName(h, allowMissingColumns=True)
    # ties at the same ts: history sorts before facts when inclusive,
    # after when exclusive — encoding <= vs < in the sort key; the
    # struct itself is the final tiebreak so duplicate-ts history rows
    # resolve deterministically (max attr tuple wins)
    w = (Window.partitionBy(*key).orderBy(ts_col, "__is_fact", "__attrs")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    unioned = unioned.withColumn(
        "__attrs", F.last("__attrs", ignorenulls=True).over(w))
    fact_flag = 1 if inclusive else 0
    out = unioned.filter(F.col("__is_fact") == fact_flag)
    for c in attr_cols:
        out = out.withColumn(c, F.col("__attrs").getField(c))
    return out.drop("__is_fact", "__attrs")
