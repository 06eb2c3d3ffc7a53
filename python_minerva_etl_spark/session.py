"""SparkSession factory with defaults tuned for the Minerva workload.

Scale notes (the config is written for a 1000-executor cluster even
though tests run on local[32]):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast demotion are the difference between a plan that works at
  sf0.1 and one that works at 100 TB.
- ``spark.sql.session.timeZone=UTC``: Minerva is tz-aware (pytz); we pin
  UTC so calendar bucketing (date_trunc day/week/month) is deterministic
  and matches the DuckDB oracle.
- ``partitionOverwriteMode=dynamic``: the plain-parquet upsert path
  (OP-SNK-UPSERT) rewrites only the time partitions present in the
  incoming batch — at 100 TB you never rewrite the whole table.
- shuffle partitions default to 2×cores locally; on a real cluster this
  is overridden (or left to AQE's coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(app_name: str = "python_minerva_etl_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cores = default_parallelism()
    if master is None:
        env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cpus}]" if env_cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT96 (the legacy default) writes no usable min/max stats, which
        # kills row-group pushdown AND snaptable's file-level merge pruning
        # on timestamp keys; micros is the modern interoperable encoding.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
