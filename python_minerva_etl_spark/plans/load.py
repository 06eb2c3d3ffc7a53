"""The load-data pipeline — Minerva's flagship ingest path (§3.1),
re-expressed as one cluster-parallel job.

Reference flow (minerva/commands/load_data.py → harvest plugin →
DataPackage → datatype deduction → entity resolution → COPY+upsert →
modified log [U]), all single-process Python + PG round-trips.

Spark flow: plugin read → normalize (timestamp parse, type widening,
DN → entity key) → last-wins upsert into time-partitioned parquet →
modified-log append (which feeds materialization fingerprints).  No
driver-side row loops anywhere; every stage is a DataFrame transform.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datatype import generalize_schemas, widen_to
from ..operators.upsert import upsert_parquet
from ..sources.plugins import get_plugin


def resolve_entities(df: DataFrame, dn_col: str = "dn") -> DataFrame:
    """DN → deterministic entity key (md5 of the dn — content-derived,
    cluster-parallel, no id-allocator; OP-DIR-ENTITY)."""
    return df.withColumn("entity_key", F.md5(F.col(dn_col).cast("binary")))


def load_data(spark: SparkSession, file_type: str, path: str,
              target_path: str, parser_config=None,
              granularity: str = "1d",
              modified_log_path: str | None = None) -> DataFrame:
    """End-to-end ingest of one file/batch into a trend store."""
    from ..granularity import trunc_col

    reader = get_plugin(file_type)
    package = reader(spark, path, parser_config)
    package = resolve_entities(package)
    package = package.withColumn(
        "__bucket",
        F.date_format(trunc_col(F.col("timestamp"), granularity),
                      "yyyy-MM-dd"))
    # schema evolution: widen target to the union lattice type if the
    # store already exists (OP-TYPE-WIDEN — the ALTER TABLE analog)
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
        merged = generalize_schemas(existing.schema, package.schema)
        package = widen_to(package, merged)
    package = package.withColumn("__seq", F.monotonically_increasing_id())
    upsert_parquet(spark, package, target_path,
                   key=["entity_key", "timestamp"], seq_col="__seq",
                   partition_col="__bucket")
    if modified_log_path:
        (package.groupBy("__bucket")
         .agg(F.count("*").alias("n_rows"),
              F.current_timestamp().alias("modified"))
         .write.mode("append").parquet(modified_log_path))
    return spark.read.parquet(target_path)
