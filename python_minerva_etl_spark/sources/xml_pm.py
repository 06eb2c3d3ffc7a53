"""Vendor PM-XML harvest parsing (OP-SRC-PLUGIN: the reference's
signature telecom ingest format).

Reference semantics (minerva/harvest/plugins.py + vendor PM plugins
[U]): 3GPP TS 32.435-style measurement collection files — a tree of
``measInfo`` blocks, each with a collection period (``granPeriod
endTime``), a measurement-type list, and one ``measValue`` per
measured object (``measObjLdn`` = the distinguished name), carrying
one result per type.  Both common spellings are supported:

- space-separated: ``<measTypes>a b</measTypes>`` +
  ``<measResults>1 2</measResults>``
- p-indexed:      ``<measType p="1">a</measType>`` + ``<r p="1">1</r>``

Spark mapping: files land whole (``wholetext`` — PM files are small,
one per node per period; millions of files parallelize across
executors with no driver involvement), then a cascade of declarative
splits scopes each ``measInfo`` / ``measValue`` fragment, and Spark's
built-in ``xpath_*`` functions (JVM-side) pull the attributes and
text nodes.  No spark-xml package, no Python row loops.

``parse_pm_long`` is the pure scale path (no driver actions).
``parse_pm`` pivots to the DataPackage shape ``(dn, timestamp, <trend
columns>)``; the pivot collects the *distinct measurement names* — a
vendor-spec-bounded metadata set (hundreds), never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BIG = 1 << 30  # slice() "rest of the array" length


def _fragments(col: str, tag: str) -> F.Column:
    """Split ``col`` into well-formed ``<tag>…</tag>`` fragment strings.

    Lookahead split keeps each opening tag with its fragment; the
    leading pre-tag chunk is dropped, and everything after the
    fragment's closing tag is trimmed so each piece parses standalone.
    """
    parts = F.split(F.col(col), f"(?=<{tag}[ >])")
    rest = F.slice(parts, 2, _BIG)
    return F.transform(
        rest,
        lambda p: F.concat(F.substring_index(p, f"</{tag}>", 1),
                           F.lit(f"</{tag}>")))


def parse_pm_long(spark: SparkSession, path: str) -> DataFrame:
    """PM files → long rows ``(dn, timestamp, trend, value_str)``.

    Fully declarative: wholetext scan → measInfo explode → measValue
    explode → (type, result) zip-explode.  Every stage is scan-local;
    the only shuffles are whatever the caller does next.
    """
    files = spark.read.text(path, wholetext=True)
    info = files.select(
        F.explode(_fragments("value", "measInfo")).alias("mi"))
    info = info.select(
        "mi",
        F.to_timestamp(
            F.expr("xpath_string(mi, '//granPeriod/@endTime')"))
        .alias("timestamp"),
        # space-separated spelling first, else the p-indexed one
        F.when(F.expr("xpath_string(mi, '//measTypes')") != "",
               F.split(F.trim(F.expr("xpath_string(mi, '//measTypes')")),
                       r"\s+"))
        .otherwise(F.expr("xpath(mi, '//measType/text()')"))
        .alias("types"),
        F.explode(_fragments("mi", "measValue")).alias("mv"))
    vals = info.select(
        "timestamp", "types",
        F.expr("xpath_string(mv, '//measValue/@measObjLdn')").alias("dn"),
        F.when(F.expr("xpath_string(mv, '//measResults')") != "",
               F.split(F.trim(F.expr("xpath_string(mv, '//measResults')")),
                       r"\s+"))
        .otherwise(F.expr("xpath(mv, '//r/text()')"))
        .alias("results"))
    return (vals
            .select("dn", "timestamp",
                    F.explode(F.arrays_zip(
                        F.col("types").alias("trend"),
                        F.col("results").alias("value_str"))).alias("tv"))
            .select("dn", "timestamp", "tv.trend",
                    F.col("tv.value_str").alias("value_str")))


def parse_pm(spark: SparkSession, path: str, config=None) -> DataFrame:
    """PM files → DataPackage shape ``(dn, timestamp, <trend cols>)``,
    types deduced through the storage lattice (OP-TYPE-DEDUCE)."""
    from ..datatype import SPARK_TYPES, deduce_column_types

    long_df = parse_pm_long(spark, path)
    names = [r[0] for r in
             long_df.select("trend").distinct().orderBy("trend").collect()]
    wide = (long_df.groupBy("dn", "timestamp")
            .pivot("trend", names)
            .agg(F.first("value_str")))
    types = deduce_column_types(wide, names)
    return wide.select(
        "dn", "timestamp",
        *[F.col(n).cast(SPARK_TYPES[types[n]]).alias(n) for n in names])
