"""Real-BPE unit tests: trainer merge order, encoder application,
and the three-way (Python / Spark expr / DuckDB SQL) count identity."""

from __future__ import annotations

import duckdb

from python_minerva_etl_spark.ext.bpe import (
    duckdb_token_count_sql, encode_word, load_merges,
    spark_token_count_expr, token_count, train_bpe)


def test_trainer_learns_frequent_pairs_first():
    """Classic subword-nmt shape: with 'est' dominating the corpus,
    the s/t and e/st merges happen before anything else ((e,s) and
    (s,t) tie at 9 occurrences; our documented tie-break takes the
    lexicographically greatest pair, so (s,t) merges first)."""
    freqs = {"newest": 6, "widest": 3, "low": 5, "lower": 2}
    merges = train_bpe(freqs, 4)
    assert merges[0] == ("s", "t")      # 9 occurrences, tie-win
    assert merges[1] == ("e", "st")     # e+st also 9
    assert encode_word("newest", merges)[-1] == "est"


def test_trainer_deterministic_and_bounded():
    freqs = {"ab": 2, "ba": 2}
    assert train_bpe(freqs, 10) == train_bpe(freqs, 10)
    # ties break to the lexicographically greatest pair
    assert train_bpe(freqs, 1)[0] == ("b", "a")
    # no pairs left -> trainer stops early
    assert len(train_bpe({"a": 5}, 10)) == 0


def test_encoder_rank_order_replace():
    merges = [("a", "b"), ("ab", "c")]
    assert encode_word("abc", merges) == ["abc"]
    assert encode_word("acb", merges) == ["a", "c", "b"]
    assert encode_word("ababab", merges) == ["ab", "ab", "ab"]
    assert encode_word("", merges) == []


def test_vendored_merges_segment_subwords():
    merges = list(load_merges())
    assert len(merges) >= 64
    # every merge is a pair of non-empty space-free symbols
    assert all(a and b and " " not in a + b for a, b in merges)
    # real segmentation: fewer pieces than characters for common words
    for w in ("partition", "aggregate", "window", "streaming"):
        pieces = encode_word(w, merges)
        assert 1 <= len(pieces) < len(w)
        assert "".join(pieces) == w  # lossless


def test_token_count_python_equals_duckdb():
    samples = ["hash join over 42 rows!", "", "   ", "don't",
               "MiXeD CaSe 1,234", "aggregate aggregate aggregate"]
    expr = duckdb_token_count_sql("t")
    con = duckdb.connect()
    for s in samples:
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)",
                          [s]).fetchone()[0]
        assert got == token_count(s), s


def test_token_count_spark_expr(spark):
    from pyspark.sql import functions as F

    samples = ["the newest widest lowest", "x 9 !", ""]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r[0] for r in
           df.select(F.expr(spark_token_count_expr("t"))).collect()]
    assert got == [token_count(s) for s in samples]


def _tuple_encode(word, merges):
    """Reference encoder with the trainer's own tuple-wise merge
    application — the semantics encode_word must reproduce."""
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_encoder_is_boundary_safe():
    """Round-5 (ADVICE r4): a bare space-joined replace would merge
    across symbol boundaries — merge (a,b) on symbols ['xa','b']
    matched 'a b' inside 'xa b' and produced 'xab'.  The sentinel
    scheme must match the trainer's tuple semantics instead."""
    merges = [("x", "a"), ("a", "b")]
    assert encode_word("xab", merges) == ["xa", "b"]
    assert encode_word("xab", merges) == _tuple_encode("xab", merges)
    # adjacent repeats still merge pairwise (shared-delimiter trap)
    assert encode_word("ababab", [("a", "b")]) == ["ab", "ab", "ab"]


def test_encoder_equals_tuple_reference_on_vendored_table():
    """Sequential sentinel replace == tuple-wise merge application for
    every word shape in a varied sample, under the real merge table."""
    merges = list(load_merges())
    words = ["partition", "aggregate", "window", "streaming", "a",
             "zzzzz", "abcabcabc", "xxyyzz", "minerva", "throughput",
             "queue", "mississippi", "aaaaaaa", "interstitial"]
    for w in words:
        got = encode_word(w, merges)
        want = _tuple_encode(w, merges)
        assert got == want, (w, got, want)
        assert "".join(got) == w


def test_encoder_property_equals_tuple_reference():
    """Property: sentinel-replace encoding == tuple-wise merge
    application for RANDOM words and RANDOM merge tables (not just
    the vendored one) — including adversarial merges whose symbols
    embed each other (the boundary-bleed class ADVICE r4 flagged)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.text(alphabet="ab", min_size=1, max_size=3)

    @settings(max_examples=80, deadline=None)
    @given(word=st.text(alphabet="ab", max_size=12),
           merges=st.lists(st.tuples(sym, sym), max_size=6))
    def check(word, merges):
        got = encode_word(word, merges)
        want = _tuple_encode(word, merges)
        # _tuple_encode starts from characters; merges whose inputs
        # aren't single chars or earlier outputs simply never fire in
        # either encoder, so equality must hold for ALL tables
        assert got == want, (word, merges, got, want)
        assert "".join(got) == word

    check()
