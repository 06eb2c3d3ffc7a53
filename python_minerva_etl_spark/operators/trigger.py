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


def zscore_outliers(df: DataFrame, entity_col: str, value_col: str,
                    z_threshold: float = 3.0,
                    min_samples: int = 10) -> DataFrame:
    """Dynamic-baseline trigger: flag rows whose value deviates more
    than ``z_threshold`` sample standard deviations from the entity's
    own mean — the adaptive complement of the static
    :class:`ThresholdRule` (a fleet-wide constant threshold misfires
    when entities have wildly different baselines, the normal case in
    telecom KPIs).

    Scale shape: one aggregation pass builds the per-entity baseline
    (Σx, Σx², n — decimal partials, so mean/std are bit-exact and
    order-independent), then the fact stream joins the tiny baseline
    table (AQE broadcasts it when it fits) and filters scan-locally.
    Two jobs, one shuffle each; no window over the fact table.
    Entities with fewer than ``min_samples`` rows are skipped (their
    std estimate is noise).
    """
    v = F.col(value_col)
    stats = df.groupBy(entity_col).agg(
        F.sum(v.cast("decimal(28,4)")).cast("double").alias("__s"),
        F.sum((v * v).cast("decimal(28,6)")).cast("double").alias("__sq"),
        F.count(value_col).cast("double").alias("__n"))
    base = stats.filter(F.col("__n") >= min_samples).select(
        entity_col,
        (F.col("__s") / F.col("__n")).alias("__mean"),
        F.sqrt((F.col("__sq") - F.col("__s") * F.col("__s") / F.col("__n"))
               / (F.col("__n") - F.lit(1.0))).alias("__std"))
    # constant-baseline entities (std == 0, or NaN from a tiny negative
    # under the sqrt) would score every row z = NaN, and NaN orders
    # above any threshold — drop them, matching the streaming twin's
    # `if std > 0.0` guard
    base = base.filter(F.col("__std") > 0)
    z = (v - F.col("__mean")) / F.col("__std")
    return (df.join(base, entity_col)
            .withColumn("z", z)
            .filter(F.abs(F.col("z")) > F.lit(z_threshold))
            .drop("__mean", "__std"))
