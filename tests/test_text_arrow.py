"""The Arrow Gopher n-gram kernel must agree per-document with the
JVM fold helpers it replaced in the declared query (r12 optimization:
the folds are interpreted CodegenFallback expressions; the kernel is
the same exact integer arithmetic in Python hash tables)."""

import pytest

from python_minerva_etl_spark.ext.text_arrow import (
    gopher_ngram_doc_stats, gopher_quintuple)

# every edge the fold helpers' own tests pin, plus separator and
# empty-token shapes (split(' ') keeps empty strings)
DOCS = [
    (1, "en", "a b a b c"),
    (2, "en", "x x x x"),
    (3, "de", "solo"),
    (4, "de", "p q r s"),
    (5, "fr", "bb c bb c a d a d"),          # count-2 tie -> lex smallest
    (6, "fr", "m n m n o m n"),
    (7, "en", ""),                            # one empty token
    (8, "en", "a  b   c"),                    # runs of spaces -> empties
    (9, "de", "w v w v w v w v w v"),         # heavy 5-gram overlap
    (10, "fr", "Aa BB Aa BB Aa BB"),          # case folding
    (11, "en", None),                         # NULL text -> all-NULL row
]


def test_gopher_quintuple_matches_jvm_folds(spark):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.ext.text import (
        token_chars, top_ngram_chars, with_dup_ngram_coverage)

    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string") \
        .withColumn("__toks", F.expr("split(lower(text), ' ')"))
    jvm = {r.doc_id: (r.tc, r.t2, r.t3, r.t4, r.d5)
           for r in with_dup_ngram_coverage(df, 5, toks_col="__toks")
           .select("doc_id",
                   token_chars(toks_col="__toks").alias("tc"),
                   top_ngram_chars(2, toks_col="__toks").alias("t2"),
                   top_ngram_chars(3, toks_col="__toks").alias("t3"),
                   top_ngram_chars(4, toks_col="__toks").alias("t4"),
                   F.col("dup5gram_chars").alias("d5")).collect()}
    for doc_id, _, text in DOCS:
        assert gopher_quintuple(text) == jvm[doc_id], (doc_id, text)


def test_gopher_doc_stats_dataframe_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    out = gopher_ngram_doc_stats(df)
    assert out.columns == ["lang", "tc", "t2", "t3", "t4", "d5"]
    rows = out.collect()
    assert len(rows) == len(DOCS)
    # per-lang sums match a driver-side reduce of the pure function;
    # NULL contributions are skipped exactly like SQL SUM
    want = {}
    for _, lang, text in DOCS:
        q = gopher_quintuple(text)
        acc = want.setdefault(lang, [0] * 5)
        for i in range(5):
            acc[i] += q[i] if q[i] is not None else 0
    got = {}
    for r in rows:
        acc = got.setdefault(r.lang, [0] * 5)
        for i, c in enumerate(("tc", "t2", "t3", "t4", "d5")):
            acc[i] += r[c] if r[c] is not None else 0
    assert got == want


def test_dsir_arrow_matches_jvm_path(spark):
    """dsir_weights_arrow / dsir_select_arrow must reproduce the JVM
    explode+fold path bit-for-bit on the fixture corpus (weights,
    masses, importance doubles and the rank order)."""
    from python_minerva_etl_spark.ext.text import dsir_select, dsir_weights
    from python_minerva_etl_spark.ext.text_arrow import (
        dsir_select_arrow, dsir_weights_arrow)
    from python_minerva_etl_spark.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    nb = 256
    w_jvm = {r.bucket: r.w for r in dsir_weights(
        docs, None, n_buckets=nb, target_where="lang = 'en'").collect()}
    w_arr = {r.bucket: r.w for r in dsir_weights_arrow(
        docs, n_buckets=nb, target_where="lang = 'en'").collect()}
    assert w_arr == w_jvm
    sel_jvm = [(r.doc_id, r.n_bigrams, r.imp_mass, r.importance, r.rank)
               for r in dsir_select(docs, None, 25, n_buckets=nb,
                                    target_where="lang = 'en'")
               .select("doc_id", "n_bigrams", "imp_mass", "importance",
                       "rank").collect()]
    sel_arr = [(r.doc_id, r.n_bigrams, r.imp_mass, r.importance, r.rank)
               for r in dsir_select_arrow(docs, 25, n_buckets=nb,
                                          target_where="lang = 'en'",
                                          carry_cols=["doc_id"])
               .select("doc_id", "n_bigrams", "imp_mass", "importance",
                       "rank").collect()]
    assert sorted(sel_arr) == sorted(sel_jvm)


def test_bigram_buckets_edge_shapes(spark):
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.ext.text_arrow import bigram_buckets

    texts = ["a b", "", "solo", "x  y", "Aa BB cC", "a b c d e"]
    df = spark.createDataFrame([(t,) for t in texts], "text string") \
        .withColumn("__tk", F.expr("split(lower(text), ' ')")) \
        .filter(F.expr("size(__tk)") >= 2)
    from python_minerva_etl_spark.ext.text import _bigram_bucket_sql
    jvm = {r.text: r.b for r in df.select(
        "text", F.expr(
            "transform(sequence(1, size(__tk) - 1), "
            f"i -> {_bigram_bucket_sql('__tk', 'i', 64)})").alias("b"))
        .collect()}
    for t in texts:
        mine = bigram_buckets(t, 64)
        want = jvm.get(t, [])
        assert mine == list(want), t


def test_text_counts_arrow_matches_jvm_exprs(spark):
    """r13: the vectorized per-doc counts (ws tokens, BPE-ish tokens,
    punct, chars) must equal the JVM expressions on every edge shape:
    unicode (incl. a surrogate-pair emoji — Java Pattern and Python
    both match it as ONE code point), tabs/newlines (Java \\s), runs
    of spaces, empties, NULL text, digits glued to letters."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.ext.text_arrow import text_counts_arrow

    texts = [None, "", " ", "  ", "a", "ab12cd", "1a2b3",
             "héllo wörld", "的是 不了", "emoji \U0001F600 here",
             "tab\tsep\nnewline\x0b\f\r", "a.b,c!d?e;f:g", "...",
             "a  b   c", " lead trail ", "a1 2b", "-x- @# 12ab!"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    jvm = {r.doc_id: (r.a, r.b, r.c, r.d) for r in df.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("bigint").alias("a"),
        F.regexp_count("text", F.lit(BPE)).cast("bigint").alias("b"),
        F.regexp_count("text", F.lit(r"[.,!?;:]")).cast("bigint")
        .alias("c"),
        F.length("text").cast("bigint").alias("d")).collect()}
    # post-3.0 size(NULL) is NULL on the non-legacy default
    jvm = {k: tuple(None if x == -1 else x for x in v)
           for k, v in jvm.items()}
    got = {r.doc_id: (r.n_tokens_ws, r.n_tokens_bpe, r.n_punct,
                      r.n_chars)
           for r in text_counts_arrow(
               df, carry_cols=["doc_id"]).collect()}
    assert got == jvm

    # fixture sample, plus passthrough column survives unchanged
    from python_minerva_etl_spark.ext.text import stopword_hits
    from python_minerva_etl_spark.registry import load_table
    docs = load_table(spark, "/root/testdata/sf0.01", "documents") \
        .limit(150)
    jvm2 = {r.doc_id: (r.a, r.b, r.s) for r in docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("bigint").alias("a"),
        F.regexp_count("text", F.lit(BPE)).cast("bigint").alias("b"),
        stopword_hits("en").alias("s")).collect()}
    got2 = {r.doc_id: (r.n_tokens_ws, r.n_tokens_bpe, r["__stop"])
            for r in text_counts_arrow(
                docs, carry_cols=["doc_id"],
                passthrough=[stopword_hits("en").alias("__stop")],
                min_bytes=0)  # force the kernel past the crossover
            .collect()}
    assert got2 == jvm2
    # below the crossover the JVM-expression path returns the same
    # schema and values
    low = {r.doc_id: (r.n_tokens_ws, r.n_tokens_bpe, r["__stop"])
           for r in text_counts_arrow(
               docs, carry_cols=["doc_id"],
               passthrough=[stopword_hits("en").alias("__stop")],
               min_bytes=1 << 40).collect()}
    assert low == jvm2


def test_c4_rules_kernel_matches_fused_jvm(spark):
    """r13: the C4 kernel path (past the crossover) must reproduce
    the fused JVM form on every edge shape — down to the rebuilt
    clean_text string — and the below-crossover path IS the fused
    JVM form."""
    from python_minerva_etl_spark.ext.text_arrow import c4_rules_kernel

    pages = [
        None, "", "nothing to keep here",
        "one two three four five.\nsix seven eight nine ten!",
        "ends with spaces after mark.   \nanother good one here ok?",
        "\n\n\n", "gap  between   words is still five.",
        "just four words here.",
        'quote "terminal works with five words."',
        "mentions javascript with five words here.",
        "MENTIONS JAVASCRIPT WITH FIVE WORDS HERE.",
        "a { code block } lorem ipsum here.\nshort.\nsix sev en eig ht?",
        "NSFW page with five words here.",
        "unicode héllo wörld counts five wörds.",
        "sentence one. two? three! four.",
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)],
                               "doc_id long, page string")
    cols = ["doc_id", "n_lines", "kept_lines", "kept_chars",
            "sentences_ok", "lorem_ok", "brace_ok", "blocklist_ok",
            "clean_text"]
    jvm = {r.doc_id: tuple(r)[1:] for r in c4_rules_kernel(
        df, "page", carry_cols=["doc_id"],
        min_bytes=1 << 40).select(*cols).collect()}
    knl = {r.doc_id: tuple(r)[1:] for r in c4_rules_kernel(
        df, "page", carry_cols=["doc_id"],
        min_bytes=0).select(*cols).collect()}
    assert knl == jvm

    # and on real fixture pages (the declared query's own assembly)
    from python_minerva_etl_spark.queries.ext_text import _C4_ENRICH
    from python_minerva_etl_spark.registry import load_table
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    from pyspark.sql import functions as F
    pg = (docs.select("source", (F.col("doc_id") % 16).alias("b"),
                      F.struct("doc_id",
                               F.expr(_C4_ENRICH).alias("l")).alias("s"))
          .groupBy("source", "b")
          .agg(F.sort_array(F.collect_list("s")).alias("a"))
          .select("source", "b",
                  F.concat_ws("\n", F.col("a.l")).alias("page")))
    cols2 = ["source", "b", "n_lines", "kept_lines", "kept_chars",
             "sentences_ok", "lorem_ok", "brace_ok", "blocklist_ok",
             "clean_text"]
    jvm2 = sorted(tuple(r) for r in c4_rules_kernel(
        pg, "page", carry_cols=["source", "b"],
        min_bytes=1 << 40).select(*cols2).collect())
    knl2 = sorted(tuple(r) for r in c4_rules_kernel(
        pg, "page", carry_cols=["source", "b"],
        min_bytes=0).select(*cols2).collect())
    assert knl2 == jvm2


def test_gopher_quintuple_on_fixture_corpus(spark):
    """Spot-check the kernel against the fold helpers on real fixture
    documents (the sf0.01 corpus), not just the synthetic edges."""
    from pyspark.sql import functions as F

    from python_minerva_etl_spark.ext.text import (
        token_chars, top_ngram_chars, with_dup_ngram_coverage)
    from python_minerva_etl_spark.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents") \
        .limit(120).withColumn("__toks", F.expr("split(lower(text), ' ')"))
    jvm = {r.doc_id: (r.tc, r.t2, r.t3, r.t4, r.d5)
           for r in with_dup_ngram_coverage(docs, 5, toks_col="__toks")
           .select("doc_id",
                   token_chars(toks_col="__toks").alias("tc"),
                   top_ngram_chars(2, toks_col="__toks").alias("t2"),
                   top_ngram_chars(3, toks_col="__toks").alias("t3"),
                   top_ngram_chars(4, toks_col="__toks").alias("t4"),
                   F.col("dup5gram_chars").alias("d5")).collect()}
    texts = {r.doc_id: r.text
             for r in docs.select("doc_id", "text").collect()}
    assert len(texts) == 120
    for doc_id, text in texts.items():
        assert gopher_quintuple(text) == jvm[doc_id], doc_id
