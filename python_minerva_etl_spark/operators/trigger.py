"""Threshold triggers — KPI expression → severity → notifications.

Reference semantics (minerva/trigger/__init__.py, minerva/commands/
trigger.py [U]): a trigger is (kpi expression over trends, ordered
severity thresholds, a filter condition, a weight); evaluating it over
a timestamp's data yields notification rows.

Spark mapping (OP-TRIG-THRESH): the KPI expression compiles via
``expr()`` to a Catalyst expression (never a Python UDF — trigger
evaluation runs over every fact row, the hottest path in the system);
severity is a CASE chain over the ordered thresholds; the result is
appended to a notification sink.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ThresholdRule:
    """Ordered severity thresholds over a KPI expression.

    ``thresholds``: (severity, lower_bound) pairs in any order — the
    highest matching bound wins, like the reference's ordered CASE
    (bounds are canonicalized here, so YAML declaration order is free).
    """

    name: str
    kpi: str  # SQL expression over the input columns
    thresholds: tuple[tuple[str, float], ...]
    condition: str = "true"  # SQL predicate
    weights: dict = field(default_factory=dict)

    def severity_col(self) -> Column:
        kpi = F.expr(self.kpi)
        out = F.lit(None).cast("string")
        # build the CASE from the lowest bound up: each higher bound
        # wraps the previous, so the highest matching bound wins
        for severity, bound in sorted(self.thresholds, key=lambda sv: sv[1]):
            out = F.when(kpi >= F.lit(bound), F.lit(severity)).otherwise(out)
        return out

    def weight_col(self) -> Column:
        out = F.lit(None).cast("bigint")
        for severity, weight in self.weights.items():
            out = F.when(F.col("severity") == severity,
                         F.lit(weight).cast("bigint")).otherwise(out)
        return out


def evaluate(df: DataFrame, rule: ThresholdRule,
             entity_col: str, ts_col: str) -> DataFrame:
    """Produce notification rows for every row matching the rule."""
    return (
        df.filter(F.expr(rule.condition))
        .withColumn("severity", rule.severity_col())
        .filter(F.col("severity").isNotNull())
        .withColumn("weight", rule.weight_col())
        .withColumn("trigger_name", F.lit(rule.name))
    )
