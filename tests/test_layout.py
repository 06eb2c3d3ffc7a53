"""Z-order layout (operators/layout.py): correctness (same rows) and
the actual point — parquet footer min/max stats prune files on BOTH
curve columns after the rewrite."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from python_minerva_etl_spark.operators.layout import (zorder_value,
                                                       zorder_write)
from python_minerva_etl_spark.registry import load_table

SF = "/root/testdata/sf0.01"


def _file_ranges(path: str, col: str) -> list[tuple]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min
                 for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max
                 for g in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def test_zorder_preserves_rows_and_prunes_both_columns(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "value")
    path = str(tmp_path / "z")
    zorder_write(ev, path, ["user_id", "value"], bits=5, num_files=16)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert (back.agg(F.sum("event_id")).first()[0]
            == ev.agg(F.sum("event_id")).first()[0])

    n_files = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_files >= 8, "not enough files to make pruning measurable"
    # point predicate on each curve column: count files whose [min,max]
    # could contain the probe — must be a small fraction of all files
    for col, probe in (("user_id", 57), ("value", 100.0)):
        ranges = _file_ranges(path, col)
        hit = sum(1 for lo, hi in ranges if lo <= probe <= hi)
        assert hit <= n_files // 2, (
            f"{col}: {hit}/{n_files} files overlap probe {probe} — "
            f"no multi-column clustering")


def test_zorder_value_is_deterministic_and_bounded(spark):
    ev = load_table(spark, SF, "events").select("user_id", "value")
    z = ev.select(zorder_value(ev, ["user_id", "value"], bits=4)
                  .alias("z"))
    stats = z.agg(F.min("z"), F.max("z"), F.countDistinct("z")).first()
    assert 0 <= stats[0] <= stats[1] < (1 << 8)  # 2 cols x 4 bits
    assert stats[2] > 16, "curve collapsed — quantization broken"
    again = ev.select(zorder_value(ev, ["user_id", "value"], bits=4)
                      .alias("z")).agg(F.sum("z")).first()[0]
    assert again == z.agg(F.sum("z")).first()[0]
