"""Declarative data-quality validation — load-time sanity contracts.

Reference context: Minerva's loaders reject malformed vendor rows and
rely on PostgreSQL constraints (NOT NULL, FKs) for store integrity
[U]; on a schema-on-read lake there is no database to enforce them, so
the engine ships the check as an operator: declare rules as data,
evaluate them in ONE pass, get back a violations report (and
optionally the clean/quarantined split).

Rule forms:

- ``predicate`` — SQL boolean over the row; rows where it is FALSE
  (or NULL) are violations.  Evaluated scan-local.
- ``unique`` — column list that must be unique; duplicates beyond the
  first occurrence are violations (one groupBy shuffle).
- ``foreign_key`` — (columns, ref_df, ref_columns); rows whose key is
  absent from the reference are violations (left-anti against the
  broadcast reference — dimension-sized by nature).

Scale shape: all predicate rules share a single scan (one conditional
aggregate for the report); unique adds one shuffle keyed by the rule's
columns; FK adds a broadcast anti-join per rule.  The report is
|rules| rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: str | None = None          # SQL boolean; False/NULL = bad
    unique: tuple[str, ...] = ()          # columns that must be unique
    foreign_key: tuple = ()               # (cols, ref_df, ref_cols)

    def __post_init__(self):
        forms = [bool(self.predicate), bool(self.unique),
                 bool(self.foreign_key)]
        if sum(forms) != 1:
            raise ValueError(
                f"rule {self.name!r}: exactly one of predicate/unique/"
                f"foreign_key required")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate ``rules`` and return the report:
    ``(rule, n_checked, n_violations, pass)`` — one row per rule.
    """
    parts: list[DataFrame] = []
    pred_rules = [r for r in rules if r.predicate]
    if pred_rules:
        # every predicate in one scan: conditional counts
        aggs = []
        for r in pred_rules:
            ok = F.expr(r.predicate)
            aggs.append(F.count(F.when(~F.coalesce(ok, F.lit(False)), 1))
                        .alias(r.name))
        row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
        for r in pred_rules:
            parts.append(row.select(
                F.lit(r.name).alias("rule"),
                F.col("__n").alias("n_checked"),
                F.col(r.name).alias("n_violations")))
    for r in rules:
        if r.unique:
            dupes = (df.groupBy(*r.unique)
                     .agg(F.count(F.lit(1)).alias("__c"))
                     .agg(F.coalesce(F.sum(F.col("__c") - 1),
                                     F.lit(0)).alias("n_violations"),
                          F.coalesce(F.sum("__c"), F.lit(0))
                          .alias("n_checked")))
            parts.append(dupes.select(F.lit(r.name).alias("rule"),
                                      "n_checked", "n_violations"))
        elif r.foreign_key:
            cols, ref, ref_cols = r.foreign_key
            keyed = ref.select(*[F.col(rc).alias(c)
                                 for c, rc in zip(cols, ref_cols)])
            miss = (df.join(F.broadcast(keyed.distinct()),
                            list(cols), "left_anti")
                    .agg(F.count(F.lit(1)).alias("n_violations")))
            total = df.agg(F.count(F.lit(1)).alias("n_checked"))
            parts.append(total.crossJoin(miss).select(
                F.lit(r.name).alias("rule"), "n_checked", "n_violations"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "pass", F.col("n_violations") == F.lit(0)).withColumn(
        "n_checked", F.col("n_checked").cast("bigint")).withColumn(
        "n_violations", F.col("n_violations").cast("bigint"))


def quarantine(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame,
                                                          DataFrame]:
    """Row-level split for predicate rules only: (clean, quarantined).
    A row is quarantined if ANY predicate rule fails on it; the
    quarantine frame carries ``failed_rules`` (array of rule names) so
    operators can repair and re-load.  Unique/FK rules are report-only
    (row-level attribution would need the shuffle anyway — run
    ``validate`` for those)."""
    pred_rules = [r for r in rules if r.predicate]
    if not pred_rules:
        raise ValueError("quarantine needs at least one predicate rule")
    fails = F.array_compact(F.array(*[
        F.when(~F.coalesce(F.expr(r.predicate), F.lit(False)),
               F.lit(r.name))
        for r in pred_rules]))
    tagged = df.withColumn("failed_rules", fails)
    clean = (tagged.filter(F.size("failed_rules") == 0)
             .drop("failed_rules"))
    bad = tagged.filter(F.size("failed_rules") > 0)
    return clean, bad
