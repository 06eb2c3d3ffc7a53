"""python_minerva_etl_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of hendrikx-itc/python-minerva-etl.

The reference (Minerva) is an ETL/warehouse platform for large-scale
time-series performance data whose heavy lifting is delegated to
PostgreSQL; this package re-expresses that entire computational surface
— trend-store time/entity aggregation, slowly-changing attribute
history, notifications, threshold triggers, incremental
materialization — as idiomatic Spark DataFrame plans, plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) required for 100 TB-scale training-data work.

Layout:
    session       SparkSession factory with scale-tuned defaults
    registry      dataset registry (the Spark analog of MinervaInstance)
    granularity   DST/calendar-aware time bucketing (ref: minerva/storage/trend/granularity.py [U])
    datatype      string->type deduction lattice (ref: minerva/storage/datatype.py [U])
    directory     entity / distinguished-name handling (ref: minerva/directory/* [U])
    operators/    aggregation, joins, windows, upsert, materialization, trigger
    sources/      csv harvest parser, plugin registry, parquet io
    streaming/    structured-streaming twins of the batch operators
    ext/          dedup, similarity, text analysis, multimodal columns
    queries/      the declared query catalog (driver contract, SURVEY.md §2)

All reference citations are module paths from the public GitHub layout
of python-minerva-etl marked [U]; the local reference checkout was
empty at survey time (SURVEY.md §0).
"""

__version__ = "0.1.0"
