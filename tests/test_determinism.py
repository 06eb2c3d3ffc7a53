"""Cross-engine bit-exactness invariants that the oracle gate rests on
(determinism.py rationale) — verified empirically against DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from python_minerva_etl_spark.registry import load_table

SF = "/root/testdata/sf0.01"


def test_decimal_sum_bit_identical(spark):
    """SUM over doubles differs across engines in the last ULP; the
    decimal-sum-surfaced-as-double pattern must be bit-identical."""
    ev = load_table(spark, SF, "events")
    s = ev.agg(
        F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
        .alias("dec_sum"),
        F.sum("value").alias("naive_sum")).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    o = con.execute(
        "SELECT CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS dec_sum, "
        "SUM(value) AS naive_sum FROM events").fetchone()
    assert repr(s.dec_sum) == repr(o[0]), "decimal path must be exact"
    # document WHY the pattern exists: the naive path genuinely drifts
    # (if it happens to agree on this data, the decimal path still holds)
    assert isinstance(o[1], float)


def test_vector_fold_bit_identical(spark):
    """Spark aggregate() sequential double fold == DuckDB list_reduce
    and list_dot_product on DOUBLE[] — the contract behind sim_topk /
    fn_array_ops / dedup_embedding_pairs."""
    emb = load_table(spark, SF, "embeddings")
    s = emb.select("vec_id", F.expr(
        "aggregate(embedding, cast(0.0 as double), "
        "(acc, x) -> acc + cast(x as double) * cast(x as double))")
        .alias("norm2")).orderBy("vec_id").toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * "
                f"FROM read_parquet('{SF}/embeddings.parquet')")
    o = con.execute(
        "SELECT vec_id, list_dot_product(CAST(embedding AS DOUBLE[]), "
        "CAST(embedding AS DOUBLE[])) AS norm2 "
        "FROM embeddings ORDER BY vec_id").df()
    assert all(repr(a) == repr(b) for a, b in zip(s.norm2, o.norm2))


def test_ns_timestamp_truncation_matches(spark):
    """events.ts (parquet ns): Spark's legacy-long read + div-1000
    truncation must equal DuckDB's ns->µs cast for every row."""
    ev = load_table(spark, SF, "events")
    s = ev.select("event_id", F.unix_micros("ts").alias("us")).orderBy(
        "event_id").toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    o = con.execute("SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us "
                    "FROM events ORDER BY event_id").df()
    assert (s.us.values == o.us.values).all()


def test_stream_batch_parity(spark):
    """OP-STR-TUMBLE availableNow == the batch flagship, bit-for-bit."""
    from python_minerva_etl_spark.streaming.tumble import (
        read_events_stream, run_available_now, tumbling_agg)

    sf = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, sf)
    got = run_available_now(
        spark, tumbling_agg(stream), "parity_test_q").toPandas()
    ev = load_table(spark, sf, "events")
    want = (ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
            .agg(F.count("*").alias("samples"),
                 F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                 .alias("sum_value"))).toPandas()

    def canon(df: pd.DataFrame):
        return sorted(map(tuple, df[sorted(df.columns)].astype(str).values))

    assert canon(got) == canon(want)
