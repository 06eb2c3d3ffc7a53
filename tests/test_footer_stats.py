"""plans/footer_stats — split-point literals from parquet footers.

The r10 verdict flagged the ``agg(max(col)).collect()`` split-point
idiom in the storage roundtrip queries as a full-column scan job per
call.  The replacement reads exact min/max from parquet footer
statistics (driver-side metadata decode, no Spark job).  These tests
pin the exactness contract against a real Spark aggregate and the
fallback behavior when footers can't answer.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from python_minerva_etl_spark.plans.footer_stats import (
    parquet_minmax, table_minmax, ts_midpoint_day)
from python_minerva_etl_spark.registry import load_table

from .conftest import SF_CORRECT

pytestmark = pytest.mark.quick


def test_event_id_minmax_matches_spark_agg(spark):
    from pyspark.sql import functions as F
    lo, hi = table_minmax(spark, SF_CORRECT, "events", "event_id")
    row = (load_table(spark, SF_CORRECT, "events")
           .agg(F.min("event_id"), F.max("event_id")).collect()[0])
    assert (lo, hi) == (row[0], row[1])


def test_user_id_minmax_matches_spark_agg(spark):
    from pyspark.sql import functions as F
    lo, hi = table_minmax(spark, SF_CORRECT, "events", "user_id")
    row = (load_table(spark, SF_CORRECT, "events")
           .agg(F.min("user_id"), F.max("user_id")).collect()[0])
    assert (lo, hi) == (row[0], row[1])


def test_ts_midpoint_day_matches_spark_derivation(spark):
    """The days-partitioned Iceberg query's predicate literal: footer
    path must land on the same whole-day midnight the old Spark
    min/max derivation produced (ns→µs truncation is monotonic, so a
    <1µs stats-vs-column delta cannot shift the midpoint's DATE)."""
    from pyspark.sql import functions as F
    mid = ts_midpoint_day(spark, SF_CORRECT)
    lo, hi = (load_table(spark, SF_CORRECT, "events")
              .agg(F.min("ts"), F.max("ts")).collect()[0])
    expect = datetime.datetime.combine(
        (lo + (hi - lo) / 2).date(), datetime.time())
    assert mid == expect


def test_directory_of_files_spans_all_parts(tmp_path):
    """Multi-file datasets (the 100 TB layout) must fold stats across
    every part file, not just one footer."""
    d = tmp_path / "multi.parquet"
    d.mkdir()
    pq.write_table(pa.table({"x": [5, 9, 7]}), d / "part-0.parquet")
    pq.write_table(pa.table({"x": [1, 3, 2]}), d / "part-1.parquet")
    # hidden/metadata files must be ignored
    (d / "_SUCCESS").write_text("")
    assert parquet_minmax(str(d), "x") == (1, 9)


def test_string_stats_refused(tmp_path):
    """BYTE_ARRAY statistics may be truncated bounds — the helper
    must return None (→ aggregate fallback), never a wrong literal."""
    p = tmp_path / "s.parquet"
    pq.write_table(pa.table({"s": ["a", "zz"]}), p)
    assert parquet_minmax(str(p), "s") is None


def test_unknown_column_raises(tmp_path):
    p = tmp_path / "u.parquet"
    pq.write_table(pa.table({"x": [1]}), p)
    with pytest.raises(KeyError):
        parquet_minmax(str(p), "nope")


def test_all_null_rowgroup_skipped(tmp_path):
    p = tmp_path / "n.parquet"
    pq.write_table(pa.table({"x": pa.array([None, None],
                                           type=pa.int64())}), p)
    # no values anywhere -> None (fallback), not a crash
    assert parquet_minmax(str(p), "x") is None


def test_no_spark_job_on_footer_path(spark):
    """The whole point: the footer path must not launch a Spark job."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    table_minmax(spark, SF_CORRECT, "events", "event_id")
    after = tracker.getJobIdsForGroup(None)
    assert before == after
