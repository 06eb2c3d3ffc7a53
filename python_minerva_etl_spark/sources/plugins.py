"""Harvest plugin registry (OP-SRC-PLUGIN).

Reference semantics (minerva/harvest/plugins.py [U]): vendor file
formats register parsers under the entry-points group
``minerva.harvest.plugins``; ``get_plugin(file_type)`` returns a
factory that builds a parser from a parser config.

Spark mapping: a plain registry of reader functions
``(spark, path, config) -> DataFrame``.  Formats with native Spark
connectors (csv/parquet/json) are pre-registered; vendor XML/PM
formats plug in the same way (a DataSource V2 implementation is NOT
required — a function returning a DataFrame composes identically).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

ReaderFn = Callable[..., DataFrame]

_REGISTRY: dict[str, ReaderFn] = {}


def register(file_type: str):
    def deco(fn: ReaderFn) -> ReaderFn:
        _REGISTRY[file_type] = fn
        return fn
    return deco


def get_plugin(file_type: str) -> ReaderFn:
    try:
        return _REGISTRY[file_type]
    except KeyError:
        raise KeyError(
            f"no harvest plugin for {file_type!r}; "
            f"registered: {sorted(_REGISTRY)}") from None


def entry_points_plugins() -> None:
    """Load third-party plugins from the ``minerva.harvest.plugins``
    entry-points group (parity with the reference's discovery).

    A broken third-party plugin is WARNED about, never fatal, and
    never silently swallowed — discovery of the remaining plugins
    continues."""
    import logging

    log = logging.getLogger(__name__)
    try:
        from importlib.metadata import entry_points
        eps = list(entry_points(group="minerva.harvest.plugins"))
    except Exception as exc:  # no metadata backend at all
        log.warning("harvest plugin discovery unavailable: %s", exc)
        return
    for ep in eps:
        try:
            _REGISTRY.setdefault(ep.name, ep.load())
        except Exception as exc:
            log.warning("skipping broken harvest plugin %r (%s): %s",
                        ep.name, getattr(ep, "value", "?"), exc)


@register("parquet")
def _read_parquet(spark: SparkSession, path: str, config=None) -> DataFrame:
    return spark.read.parquet(path)


@register("csv")
def _read_csv(spark: SparkSession, path: str, config=None) -> DataFrame:
    from .csv import ParserConfig, parse_packages
    return parse_packages(spark, path, config or ParserConfig())


@register("json")
def _read_json(spark: SparkSession, path: str, config=None) -> DataFrame:
    return spark.read.json(path)


@register("orc")
def _read_orc(spark: SparkSession, path: str, config=None) -> DataFrame:
    return spark.read.orc(path)


@register("delta")
def _read_delta(spark: SparkSession, path: str, config=None) -> DataFrame:
    """Delta table read via the stdlib transaction-log replayer
    (storage/delta.py) — no Delta jar required.  ``config`` may carry
    ``version_as_of`` for time travel."""
    from ..storage.delta import read_delta
    version = getattr(config, "version_as_of", None) if config else None
    return read_delta(spark, path, version_as_of=version)


@register("iceberg")
def _read_iceberg(spark: SparkSession, path: str, config=None) -> DataFrame:
    """Iceberg table read via the stdlib metadata/Avro-manifest
    replayer (storage/iceberg.py) — no Iceberg runtime jar.
    ``config`` may carry ``snapshot_id`` for time travel."""
    from ..storage.iceberg import read_iceberg
    snap = getattr(config, "snapshot_id", None) if config else None
    return read_iceberg(spark, path, snapshot_id=snap)


@register("avro")
def _read_avro(spark: SparkSession, path: str, config=None) -> DataFrame:
    """Avro object-container read via the stdlib decoder
    (sources/avro.py) — no spark-avro jar; sync-marker byte-range
    splits (one task per ~128 MiB, not per file), logical types
    (decimal/date/timestamp) converted.  ``config`` may carry
    ``split_bytes`` (range size) and ``columns`` (decode-level
    projection pruning)."""
    from .avro import read_avro
    kw = {}
    sb = getattr(config, "split_bytes", None) if config else None
    if sb is not None:
        kw["split_bytes"] = int(sb)
    cols = getattr(config, "columns", None) if config else None
    if cols is not None:
        kw["columns"] = list(cols)
    return read_avro(spark, path, **kw)


@register("jsonl")
def _read_jsonl(spark: SparkSession, path: str, config=None) -> DataFrame:
    """Newline-delimited JSON — the de-facto web-corpus interchange
    format (one document object per line).  Spark's json reader is
    already line-oriented; multiline stays off so a 100 TB dump splits
    by line across executors instead of one task per file."""
    reader = spark.read
    if config and getattr(config, "schema", None) is not None:
        reader = reader.schema(config.schema)
    return reader.json(path)


@register("xml-pm")
def _read_xml_pm(spark: SparkSession, path: str, config=None) -> DataFrame:
    from .xml_pm import parse_pm
    return parse_pm(spark, path, config)
