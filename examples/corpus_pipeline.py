#!/usr/bin/env python
"""End-to-end LLM training-data curation walkthrough — every stage a
100 TB corpus pipeline runs, composed from this engine's operators at
toy scale (the per-stage operators are individually oracle-verified
by the declared-query catalog; this script shows how they chain).

  1. filter funnel    — cheap scan-local quality gates (length,
                        repetition, boilerplate heuristics) plus the
                        two canonical public rule sets: Gopher word
                        rules (Rae et al. 2021) and C4 page rules
                        (Raffel et al. 2020) — all one scan
  2. exact dedup      — content-hash, keep canonical
  3. near dedup       — MinHash+LSH candidates, exact Jaccard verify,
                        connected components, keep cluster canonical
  4. semantic dedup   — cluster-scoped embedding cosine (SemDeDup)
  5. quality pruning  — per-language quantile threshold
  6. mixing           — temperature-weighted source rebalancing
  7. epoch planning   — capped whole-epoch upsampling of small sources
  8. packing          — hash-sharded first-fit into token budgets
  9. split + shuffle  — deterministic md5 train/holdout + order salt
 10. DSIR selection   — importance-resample toward a target domain
                        (Xie et al. 2023; scan-local scoring)

Run: python examples/corpus_pipeline.py  [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str) -> dict:
    from python_minerva_etl_spark.ext import text as X
    from python_minerva_etl_spark.ext.clusters import (dedup_keep_canonical,
                                                       semantic_dedup)
    from python_minerva_etl_spark.ext.dedup import (exact_dedup,
                                                    near_dup_pairs_lsh)
    from python_minerva_etl_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    counts = {"raw": docs.count()}

    # 1. cheap gates first — they delete the most bytes per CPU
    # cycle.  The Gopher word rules and C4 page rules ride the SAME
    # scan (every rule is a scan-local expression; at 100 TB this
    # whole step is one pass, no shuffle).
    gated = (docs
             .select("*", *X.gopher_word_rules(min_words=5),
                     *X.c4_page_rules())
             .filter(F.col("mean_len_ok") & F.col("alpha_ok")
                     & F.col("word_count_ok") & F.col("lorem_ok")
                     & F.col("brace_ok") & F.col("blocklist_ok")
                     & (F.length("text") >= F.lit(20)))
             .drop("word_count_ok", "mean_len_ok", "alpha_ok",
                   "symbol_ok", "stopword_ok", "sentences_ok",
                   "lorem_ok", "brace_ok", "blocklist_ok"))
    counts["gated"] = gated.count()

    # 2. exact dedup (hash-agg, one shuffle)
    keep_exact = exact_dedup(gated).select(
        F.col("keep_id").alias("doc_id"))
    gated = gated.join(keep_exact, "doc_id", "left_semi")
    counts["exact_dedup"] = gated.count()

    # 3. near dedup: LSH candidates -> exact verify -> components
    pairs = near_dup_pairs_lsh(gated, threshold=0.92)
    decision = dedup_keep_canonical(gated, pairs)
    gated = gated.join(decision.filter("keep").select("doc_id"),
                       "doc_id", "left_semi")
    counts["near_dedup"] = gated.count()

    # 4. semantic dedup over the embedding table (toy 1:1 id mapping)
    sem = semantic_dedup(emb, k=8, tau=0.47)
    sem_keep = sem.filter("kept").select(F.col("vec_id").alias("doc_id"))
    gated = gated.join(sem_keep, "doc_id", "left_semi")
    counts["semantic_dedup"] = gated.count()

    # 5. per-language quality pruning (threshold broadcast, no shuffle)
    pruned_ids = X.quality_prune(gated, keep_frac=0.7).select("doc_id")
    gated = gated.join(pruned_ids, "doc_id", "left_semi")
    counts["quality_pruned"] = gated.count()

    # 6. temperature-weighted source rebalancing (scan-local filter)
    sampled = X.temperature_sample(gated, "doc_id", "source",
                                   target_frac=0.8)
    counts["temperature_sampled"] = sampled.count()

    # 7. epoch planning: small sources repeat, capped
    epochs = X.mix_epochs(sampled, budget_tokens=200_000, max_epochs=3)
    counts["epoch_rows"] = epochs.count()

    # 8. pack into ~512-token sequences (hash-sharded first-fit)
    corpus = (epochs.join(sampled.select("doc_id", "text"), "doc_id")
              .withColumn("pack_id",
                          F.concat_ws("-", "doc_id", "repeat_ix")))
    packed = X.pack_sequences(corpus, "pack_id",
                              X.token_count_ws(), seq_len=512)
    counts["sequences"] = packed.select("shard", "seq").distinct().count()

    # 9. deterministic split + shuffle
    final = X.hash_split(X.deterministic_shuffle(
        sampled, "doc_id"), "doc_id", train_frac=0.9)
    counts["train"] = final.filter("split = 'train'").count()
    counts["holdout"] = final.filter("split = 'holdout'").count()

    # 10. DSIR: importance-resample the train split toward a target
    # domain (here: the corpus' English subset) — the weight table
    # collapses to 1024 rows map-side and rides the scoring scan as
    # a literal array; selection is a distributed TopK
    train = final.filter("split = 'train'")
    counts["dsir_selected"] = X.dsir_select(
        train, None, k=min(100, counts["train"]),
        target_where="lang = 'en'").count()
    return counts


def main() -> None:
    from python_minerva_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-pipeline-demo",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    counts = run(spark, sf_dir)
    width = max(len(k) for k in counts)
    for stage, n in counts.items():
        print(f"{stage:>{width}} : {n}")


if __name__ == "__main__":
    main()
