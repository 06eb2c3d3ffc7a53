"""Dataset registry — the Spark analog of Minerva's instance/directory.

Minerva registers trend stores / attribute stores / relations in
PostgreSQL schemas (``directory``, ``trend_directory``, …; ref:
minerva/instance/__init__.py [U]).  Here a registry is simply a mapping
name -> parquet location + role, and ``load_tables`` materializes
DataFrames (and temp views, so ``spark.sql`` works against them).

Dimension tables are flagged so join sites can wrap them in
``broadcast()`` — at 100 TB the fact tables shuffle on their keys while
the dims (region/nation/supplier/part/customer ≈ MB-scale) replicate to
every executor and never shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Tables small enough (at any realistic scale factor — these are the
# Minerva "directory" analogs) to broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; normalizes ns-precision timestamps.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark 4 refuses to
    read natively; we read it as a long (legacy conf) and truncate to
    µs — the same truncation DuckDB applies when casting TIMESTAMP_NS
    to TIMESTAMP, so both engines see identical instants.  Integer
    ``div`` (not /) — ns-since-epoch ≈ 1.7e18 exceeds double precision.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Minerva is tz-aware with a pinned zone; calendar bucketing
        # (date_trunc day/week/month) must run under UTC to match the
        # oracle regardless of how the caller built the session.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf may be static in some deployments; read still works if set at build time
    df = spark.read.parquet(table_path(sf_dir, name))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(field.dataType, T.TimestampNTZType):
            # µs-precision NTZ parquet (isAdjustedToUTC=false): interpret
            # the wall-clock value as UTC.  Under the pinned UTC session
            # zone this cast is instant-preserving, and downstream code
            # (unix_micros, window(), watermarks) requires TIMESTAMP.
            df = df.withColumn(field.name,
                               F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES,
                register_views: bool = False) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names:
        if os.path.exists(table_path(sf_dir, name)):
            # via load_table so the ns-timestamp normalization and
            # UTC/legacy confs apply uniformly however a table is read
            df = load_table(spark, sf_dir, name)
            out[name] = df
            if register_views:
                df.createOrReplaceTempView(name)
    return out
