"""Gap-based sessionization (EXT-SESS / OP-STR-SESSION batch form).

Batch twin of ``session_window``: a new session starts when the gap to
the previous event exceeds ``gap_seconds``.  lag + running-sum run-id,
one shuffle on the entity key.  Gap comparison is done on integer
microseconds (``unix_micros``) so the oracle (``epoch_us``) compares
the exact same integers — never on second-truncated timestamps, which
would misclassify sub-second gaps at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(df: DataFrame, key: list[str], ts_col: str,
               gap_seconds: int, order_tiebreak: list[str] = ()) -> DataFrame:
    """Assign ``session_seq`` (1-based per key, in time order)."""
    micros = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(*key).orderBy(ts_col, *order_tiebreak)
    gap = micros - F.lag(micros).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.lit(gap_seconds * 1_000_000)), 1).otherwise(0)
    run = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn("session_seq", run.cast("bigint"))
