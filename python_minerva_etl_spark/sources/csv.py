"""CSV harvest parsing (OP-SRC-CSV).

Reference semantics (minerva/loading/csv/parser.py,
minerva/harvest/fileprocessor.py [U]): a ParserConfig names the
delimiter/header mode, the timestamp column + format, an
entity-identifier expression over the columns, and the selected value
columns; the parser yields typed DataPackages.

Spark mapping: ``spark.read.csv`` with declared options, then a single
projection pass that parses the timestamp (``to_timestamp`` with the
configured format), evaluates the entity expression (``expr()`` — the
Spark analog of the reference's identifier lambdas, but compiled to
Catalyst instead of per-row Python), and casts value columns through
the type lattice.  Chunked reads are free: the CSV scan is split by
the cluster; at 100 TB the files parallelize across executors with no
driver involvement.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datatype import SPARK_TYPES


@dataclass(frozen=True)
class ParserConfig:
    """Declarative CSV parse spec (the reference's parser_config YAML)."""

    delimiter: str = ","
    header: bool = True
    timestamp_column: str = "timestamp"
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss"
    entity_expression: str = "entity"  # SQL expr building the DN string
    value_columns: tuple[str, ...] = ()
    value_types: dict = field(default_factory=dict)  # col -> lattice type name
    null_value: str = ""


def read_csv(spark: SparkSession, path: str, config: ParserConfig) -> DataFrame:
    return (
        spark.read
        .option("delimiter", config.delimiter)
        .option("header", str(config.header).lower())
        .option("nullValue", config.null_value)
        .csv(path)
    )


def parse_packages(spark: SparkSession, path: str,
                   config: ParserConfig) -> DataFrame:
    """File → normalized trend rows ``(dn, timestamp, value columns…)``.

    The typed-DataPackage analog: one declarative projection, no
    row-at-a-time Python.
    """
    from ..datatype import deduce_column_types

    raw = read_csv(spark, path, config)
    value_cols = [c for c in (config.value_columns or raw.columns)
                  if c != config.timestamp_column]
    # reference behavior: types not declared in the parser config are
    # deduced from the observed strings (storage/datatype.py [U])
    types = dict(config.value_types)
    undeclared = [c for c in value_cols if c not in types]
    if undeclared:
        types.update(deduce_column_types(raw, undeclared))
    cols = [
        F.expr(config.entity_expression).alias("dn"),
        F.to_timestamp(F.col(config.timestamp_column),
                       config.timestamp_format).alias("timestamp"),
    ]
    for c in value_cols:
        cols.append(F.col(c).cast(SPARK_TYPES[types[c]]).alias(c))
    return raw.select(*cols)
