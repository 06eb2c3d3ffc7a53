"""Dedup family invariants: the scale paths agree with the exact
contracts (recall for LSH, candidate containment for SimHash)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_minerva_etl_spark.ext.dedup import (minhash_lsh_candidates,
                                                near_dup_pairs_exact,
                                                near_dup_pairs_lsh)
from python_minerva_etl_spark.registry import load_table

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_lsh_verified_pairs_subset_and_recall(spark):
    docs = load_table(spark, SF, "documents")
    exact = _pairs(near_dup_pairs_exact(docs, 0.9))
    lsh = _pairs(near_dup_pairs_lsh(docs, 0.9))
    # precision 1.0 by construction (exact verify phase)
    assert lsh <= exact
    # recall: banding (s^8 curve) must keep nearly all >=0.9 pairs
    if exact:
        assert len(lsh) / len(exact) >= 0.95


def test_minhash_candidates_cover_high_similarity(spark):
    docs = load_table(spark, SF, "documents")
    exact = _pairs(near_dup_pairs_exact(docs, 0.95))
    cand = _pairs(minhash_lsh_candidates(docs).withColumnRenamed(
        "doc_a", "doc_a").withColumnRenamed("doc_b", "doc_b"))
    if exact:
        covered = len(exact & cand) / len(exact)
        assert covered >= 0.95


def test_exact_dedup_no_false_groups(spark):
    from python_minerva_etl_spark.ext.dedup import exact_dedup

    docs = load_table(spark, SF, "documents")
    groups = exact_dedup(docs)
    # hash groups partition the corpus: sum of n_dups == doc count
    total = groups.agg(F.sum("n_dups")).collect()[0][0]
    assert total == docs.count()
    assert groups.filter(F.col("keep_id").isNull()).count() == 0
