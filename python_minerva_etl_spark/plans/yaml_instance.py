"""MinervaInstance loading — YAML definition directories.

Reference semantics (minerva/instance/__init__.py [U]): an instance is
a directory tree of YAML definitions::

    instance/
      trend/*.yaml            # trend stores (parts -> trends)
      relation/*.yaml         # entity hierarchy mappings
      trigger/*.yaml          # threshold rules
      materialization/*.yaml  # derived stores + delays

``minerva initialize`` compiles these to PostgreSQL DDL; here they
compile to the dataclasses in plans/instance.py and operators/
trigger.py, ready to drive DataFrame pipelines.  YAML field names
follow the reference's published instance format [U]; unknown fields
are ignored (forward compatible).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml

from ..operators.trigger import ThresholdRule
from .instance import Relation, Trend, TrendStore, TrendStorePart


@dataclass
class MaterializationDef:
    name: str
    source: str
    target_granularity: str
    processing_delay: str = "30m"
    stability_delay: str = "5m"
    reprocessing_period: str = "3 days"


@dataclass
class CheckSet:
    """A named data-quality contract (check/*.yaml): raw rule dicts,
    compiled to operators/validation.Rule at run time (FK references
    need a live SparkSession to read)."""
    name: str
    rules: list[dict] = field(default_factory=list)

    def compile(self, spark):
        from ..operators.validation import Rule

        out = []
        for r in self.rules:
            if "predicate" in r:
                out.append(Rule(r["name"], predicate=r["predicate"]))
            elif "unique" in r:
                out.append(Rule(r["name"], unique=tuple(r["unique"])))
            elif "foreign_key" in r:
                fk = r["foreign_key"]
                ref = spark.read.parquet(fk["ref_table"])
                out.append(Rule(r["name"], foreign_key=(
                    tuple(fk["columns"]), ref, tuple(fk["ref_columns"]))))
            else:
                raise ValueError(
                    f"check rule {r.get('name')!r}: needs one of "
                    f"predicate/unique/foreign_key")
        return out


@dataclass
class MinervaInstance:
    trend_stores: list[TrendStore] = field(default_factory=list)
    relations: list[Relation] = field(default_factory=list)
    triggers: list[ThresholdRule] = field(default_factory=list)
    materializations: list[MaterializationDef] = field(default_factory=list)
    checks: list[CheckSet] = field(default_factory=list)

    @classmethod
    def load(cls, instance_dir: str) -> "MinervaInstance":
        if not os.path.isdir(instance_dir):
            raise FileNotFoundError(
                f"instance directory {instance_dir!r} does not exist")
        inst = cls()
        for sub, loader in (("trend", inst._load_trend_store),
                            ("relation", inst._load_relation),
                            ("trigger", inst._load_trigger),
                            ("materialization", inst._load_materialization),
                            ("check", inst._load_check)):
            d = os.path.join(instance_dir, sub)
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if name.endswith((".yaml", ".yml")):
                    with open(os.path.join(d, name)) as fh:
                        doc = yaml.safe_load(fh)
                    if doc:
                        loader(doc)
        return inst

    def _load_trend_store(self, doc: dict) -> None:
        parts = tuple(
            TrendStorePart(
                name=p["name"],
                trends=tuple(
                    Trend(name=t["name"],
                          data_type=t.get("data_type", "double"),
                          time_aggregation=str(
                              t.get("time_aggregation", "sum")).lower(),
                          entity_aggregation=str(
                              t.get("entity_aggregation", "sum")).lower())
                    for t in p.get("trends", ())))
            for p in doc.get("parts", ()))
        self.trend_stores.append(TrendStore(
            data_source=doc["data_source"],
            entity_type=doc["entity_type"],
            granularity=str(doc["granularity"]),
            parts=parts,
            partition_size=str(doc.get("partition_size", "1d"))))

    def _load_relation(self, doc: dict) -> None:
        self.relations.append(Relation(
            name=doc["name"],
            source_col=doc.get("source", "source_id"),
            target_col=doc.get("target", "target_id")))

    def _load_trigger(self, doc: dict) -> None:
        thresholds = tuple(
            (th["severity"], float(th["value"]))
            for th in doc.get("thresholds", ()))
        weights = {th["severity"]: int(th.get("weight", 1))
                   for th in doc.get("thresholds", ())}
        self.triggers.append(ThresholdRule(
            name=doc["name"],
            kpi=doc.get("kpi", doc.get("expression", "value")),
            thresholds=thresholds,
            condition=doc.get("condition", "true"),
            weights=weights))

    def _load_materialization(self, doc: dict) -> None:
        self.materializations.append(MaterializationDef(
            name=doc["name"],
            source=doc["source"],
            target_granularity=str(doc.get("target_granularity",
                                           doc.get("granularity", "1h"))),
            processing_delay=str(doc.get("processing_delay", "30m")),
            stability_delay=str(doc.get("stability_delay", "5m")),
            reprocessing_period=str(doc.get("reprocessing_period", "3 days"))))

    def _load_check(self, doc: dict) -> None:
        self.checks.append(CheckSet(
            name=doc["name"], rules=list(doc.get("rules", ()))))
