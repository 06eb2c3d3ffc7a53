"""Benchmark-contamination detection: word-n-gram overlap between a
training corpus and a (small) benchmark/eval set — the pre-training
hygiene check (GPT-3 appendix C style: a document is contaminated when
it shares any length-``n`` token span with an eval document).

Scale shape: the benchmark side collapses to a distinct gram set
(small — benchmarks are MBs, the corpus is TBs) and BROADCASTS; the
corpus is shingled scan-locally and probed with a broadcast hash join,
so the 100 TB pass is one scan + one map-side join, no corpus shuffle.
All shingling is Catalyst array expressions (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams_expr(text_col: str, n: int) -> str:
    """Distinct word-``n``-grams of ``lower(text)`` as an array<string>.
    Shorter-than-``n`` documents yield their single full-text gram
    (slice clamps), matching the DuckDB oracle's list_slice."""
    w = f"split(lower(`{text_col}`), ' ')"
    return (f"array_distinct(transform("
            f"sequence(1, greatest(size({w}) - {n - 1}, 1)), "
            f"i -> concat_ws(' ', slice({w}, i, {n}))))")


def ngram_overlap(corpus: DataFrame, benchmark: DataFrame, n: int = 5,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-corpus-document contamination report: how many of its
    distinct word-``n``-grams appear anywhere in the benchmark set.

    Returns ``(doc_id, n_grams, n_hit, contamination)`` for documents
    with at least one hit; ``contamination`` is the hit fraction of
    the document's distinct grams (the usual drop/flag threshold
    input).
    """
    grams = _grams_expr(text_col, n)
    corp = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.expr(grams).alias("__grams"))
    cg = corp.select(
        "doc_id", F.size("__grams").alias("n_grams"),
        F.explode("__grams").alias("gram"))
    bench_grams = (benchmark.select(F.explode(F.expr(grams)).alias("gram"))
                   .distinct())
    hits = (cg.join(F.broadcast(bench_grams), "gram")
            .groupBy("doc_id", "n_grams")
            .agg(F.count("*").alias("n_hit")))
    # plain IEEE division of two exact integers — bit-identical in any
    # engine, so the oracle compares without rounding fuzz
    return hits.select(
        "doc_id", "n_grams", "n_hit",
        (F.col("n_hit").cast("double")
         / F.col("n_grams").cast("double")).alias("contamination"))
