"""Long ↔ wide trend reshaping.

Minerva's storage model is wide (one physical column per trend), but
harvest data often arrives long: rows of (entity, ts, trend_name,
value) — e.g. generic vendor counter dumps.  The loader pivots long →
wide before storing; reporting sometimes needs the inverse.

Spark mapping: pivot with an **explicit trend list** (from the trend
store declaration) — never the two-pass schema-inferring
``pivot(col)`` without values, which scans the data once just to learn
the columns; the declaration already knows them (and at 100 TB a
discovery pass over the fact table is a full extra scan).
Wide → long is a generator-free ``stack`` expression: scan-local,
no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def long_to_wide(df: DataFrame, key: list[str], name_col: str,
                 value_col: str, trend_names: list[str],
                 agg: str = "sum") -> DataFrame:
    """Pivot long counter rows into one wide row per key.

    ``agg`` resolves duplicate (key, trend) rows (Minerva: SUM for
    counters, MAX/last for gauges).  Exact for sum via decimal.
    """
    aggs = []
    for name in trend_names:
        matched = F.when(F.col(name_col) == name, F.col(value_col))
        if agg == "sum":
            col = F.sum(matched.cast("decimal(28,6)")).cast("double")
        elif agg == "max":
            col = F.max(matched)
        elif agg == "min":
            col = F.min(matched)
        elif agg == "count":
            col = F.count(matched)
        else:
            raise ValueError(f"unsupported pivot agg {agg!r}")
        aggs.append(col.alias(name))
    return df.groupBy(*key).agg(*aggs)


def wide_to_long(df: DataFrame, key: list[str],
                 trend_names: list[str],
                 name_col: str = "trend",
                 value_col: str = "value") -> DataFrame:
    """Unpivot wide trend columns back to long rows (scan-local)."""
    pairs = ", ".join(f"'{n}', cast(`{n}` as double)" for n in trend_names)
    stacked = F.expr(
        f"stack({len(trend_names)}, {pairs}) as ({name_col}, {value_col})")
    return df.select(*key, stacked)
