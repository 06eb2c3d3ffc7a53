#!/usr/bin/env python
"""Same-session interleaved A/B timing of text-query expression
variants (r13): cross-run comparisons on this box are polluted by
multi-minute load waves (the r13 before/after probe pair measured
gates 0.78 vs 1.00-1.09 — a 30% yardstick shift), so every variant
here runs IN ONE session, round-robin interleaved (variant order
rotates per round), noop-forced, gated at the start.  The "old"
variants reconstruct the pre-r13 expression forms inline; the "new"
ones call the declared query bodies.  Medians over ROUNDS passes.

Usage: python scripts/probe_text_ab.py [sf_dir] [--out F] [--family q|c4|tok|lang ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = 5


def _variants(spark, sf_dir, families):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.queries.catalog import all_queries
    from python_minerva_etl_spark.queries.ext_text import _C4_ENRICH
    from python_minerva_etl_spark.registry import load_table

    qs = all_queries()
    docs = lambda: load_table(spark, sf_dir, "documents")  # noqa: E731

    def stop_old(lang_words, text_col="text"):
        words = ", ".join(f"'{w}'" for w in lang_words)
        return F.expr(f"size(filter(split(lower({text_col}), ' '), "
                      f"x -> x IN ({words})))").cast("bigint")

    def punct_old(text_col="text"):
        return F.length(F.regexp_replace(
            F.col(text_col), r"[^.,!?;:]", "")).cast("bigint")

    def punct_translate(text_col="text"):
        return (F.length(text_col)
                - F.length(F.translate(F.col(text_col), ".,!?;:", ""))
                ).cast("bigint")

    from python_minerva_etl_spark.ext.text import (LANG_PROFILES,
                                                   token_count_bpe_ish,
                                                   token_count_ws)
    from python_minerva_etl_spark.ext.text import stopword_hits as _stop_new

    def quality_with(punct_fn, stop_fn):
        def build():
            n_tok = token_count_ws().cast("double")
            stop_ratio = stop_fn(LANG_PROFILES["en"]).cast("double") / n_tok
            punct_ratio = punct_fn().cast("double") / \
                F.length("text").cast("double")
            len_score = F.least(n_tok / F.lit(32.0), F.lit(1.0))
            quality = (F.lit(0.5) * len_score
                       + F.lit(0.3) * F.least(stop_ratio * F.lit(4.0),
                                              F.lit(1.0))
                       + F.lit(0.2) * (F.lit(1.0)
                                       - F.least(punct_ratio * F.lit(10.0),
                                                 F.lit(1.0))))
            return docs().select(
                "doc_id", token_count_ws().alias("n_tokens"),
                token_count_bpe_ish().alias("n_tokens_bpe"),
                punct_fn().alias("n_punct"), quality.alias("quality"))
        return build

    def c4_pages(sort_native):
        d = docs().select(
            "source", (F.col("doc_id") % 16).alias("b"),
            F.struct("doc_id", F.expr(_C4_ENRICH).alias("l")).alias("s"))
        g = d.groupBy("source", "b")
        if sort_native:
            return g.agg(F.sort_array(F.collect_list("s")).alias("a")) \
                .select("source", "b",
                        F.concat_ws("\n", F.col("a.l")).alias("page"))
        return g.agg(F.array_sort(F.collect_list("s")).alias("a")) \
            .select("source", "b", F.concat_ws(
                "\n", F.expr("transform(a, x -> x.l)")).alias("page"))

    def c4_old_stats(pages):
        keep = ("right(rtrim(l), 1) IN ('.', '!', '?', '\"') "
                "AND size(split(trim(l), ' +')) >= 5 "
                "AND NOT contains(lower(l), 'javascript')")
        lines = "split(page, '\\n')"
        kept = f"filter({lines}, l -> {keep})"
        d = pages.select(
            "source", "b", "page",
            F.expr(f"size({lines})").cast("bigint").alias("n_lines"),
            F.expr(f"size({kept})").cast("bigint").alias("kept_lines"),
            F.expr(f"aggregate({kept}, CAST(0 AS BIGINT), "
                   "(a, l) -> a + length(l))").alias("kept_chars"),
            F.expr(f"array_join({kept}, '\\n')").alias("clean_text"))
        from python_minerva_etl_spark.ext.text import c4_page_rules
        return d.select("source", "b", "n_lines", "kept_lines",
                        "kept_chars",
                        *c4_page_rules("page", clean_col="clean_text"),
                        "clean_text")

    def c4_new_stats(pages):
        from python_minerva_etl_spark.ext.text import (c4_line_stats_fused,
                                                       c4_page_rules)
        d = c4_line_stats_fused(pages, "page")
        return d.select("source", "b", "n_lines", "kept_lines",
                        "kept_chars",
                        *c4_page_rules("page", clean_col="clean_text"),
                        "clean_text")

    def tok_distinct():
        from python_minerva_etl_spark.ext.text import (token_count_bpe_ish,
                                                       token_count_ws)
        d = docs()
        toks = d.select("lang", F.explode(F.array_distinct(
            F.split(F.lower("text"), " "))).alias("tok"))
        vocab = toks.groupBy("lang").agg(
            F.countDistinct("tok").alias("distinct_tokens"))
        stats = d.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count_ws()).cast("bigint").alias("total_tokens_ws"),
            F.sum(token_count_bpe_ish()).cast("bigint")
            .alias("total_tokens_bpe"))
        return stats.join(vocab, "lang")

    def langid_old():
        scored = docs().select(
            "doc_id", F.col("lang").alias("lang_actual"),
            *[stop_old(ws).alias(f"score_{lg}")
              for lg, ws in LANG_PROFILES.items()])
        from python_minerva_etl_spark.ext.text import langid_pred
        from pyspark.sql.window import Window
        scored = scored.withColumn("lang_pred", langid_pred())
        cm = scored.groupBy("lang_actual", "lang_pred").agg(
            F.count("*").alias("n"))
        w = Window.partitionBy("lang_actual")
        return cm.select("lang_actual", "lang_pred", "n",
                         (F.col("n").cast("double")
                          / F.sum("n").over(w).cast("double"))
                         .alias("share_of_actual"))

    fams = {
        "q": {
            "quality_old_hof": quality_with(punct_old, stop_old),
            "quality_new_regex": lambda: qs["text_quality_score"]
            .spark(spark, sf_dir),
            "quality_translate": quality_with(
                punct_translate, lambda _w: _stop_new("en")),
        },
        "c4": {
            "c4_old_full": lambda: c4_old_stats(c4_pages(False)),
            "c4_new_full": lambda: qs["text_c4_rules"].spark(spark, sf_dir),
            "c4_oldpages_newstats": lambda: c4_new_stats(c4_pages(False)),
            "c4_newpages_oldstats": lambda: c4_old_stats(c4_pages(True)),
        },
        "tok": {
            "tokstats_declared": lambda: qs["text_token_stats"]
            .spark(spark, sf_dir),
            "tokstats_arraydistinct": tok_distinct,
        },
        "lang": {
            "langid_conf_old_hof": langid_old,
            "langid_conf_new_regex": lambda: qs["text_langid_confusion"]
            .spark(spark, sf_dir),
        },
    }
    out = {}
    for f in families:
        out.update(fams[f])
    return out


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    fams = ["q", "c4", "tok", "lang"]
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_path = args[i + 1]
            i += 2
        elif args[i] == "--family":
            fams = args[i + 1].split(",")
            i += 2
        else:
            pos.append(args[i])
            i += 1
    sf_dir = pos[0] if pos else "/tmp/sf10"

    from benchgate import contention_gate, force
    from python_minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="probe-text-ab")
    spark.sparkContext.setLogLevel("ERROR")
    gate = contention_gate(spark)
    print(f"# gate: {gate['rebaseline_gate']}", file=sys.stderr)

    variants = _variants(spark, sf_dir, fams)
    names = list(variants)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for n in names:                     # one warmup each
        spark.sparkContext.setJobDescription(f"ab-warm {n}")
        force(variants[n]())
    for r in range(ROUNDS):
        order = names[r % len(names):] + names[:r % len(names)]
        for n in order:
            spark.sparkContext.setJobDescription(f"ab {n} r{r}")
            t0 = time.perf_counter()
            force(variants[n]())
            samples[n].append(time.perf_counter() - t0)
    doc = {"probe": "text_ab", "sf_dir": sf_dir, "rounds": ROUNDS,
           "gate": gate["rebaseline_gate"],
           "contended": gate["contended"], "variants": {}}
    for n in names:
        s = samples[n]
        doc["variants"][n] = {
            "median_sec": round(statistics.median(s), 3),
            "spread": round(max(s) - min(s), 3),
            "samples": [round(x, 3) for x in s]}
        print(f"{n:28s} {doc['variants'][n]['median_sec']:7.3f} "
              f"±{doc['variants'][n]['spread']:.3f}")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
