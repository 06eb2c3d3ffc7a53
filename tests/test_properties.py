"""Hypothesis property tests for the pure-python core (type lattice,
granularity algebra) — the invariants the dynamic-schema ingest and the
materialization scheduler rely on."""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from python_minerva_etl_spark.datatype import (deduce_from_string,
                                               generalize)
from python_minerva_etl_spark.granularity import Granularity

TYPES = ["smallint", "integer", "bigint", "double", "text",
         "boolean", "timestamp"]


@given(st.sampled_from(TYPES), st.sampled_from(TYPES))
def test_generalize_commutative(a, b):
    assert generalize(a, b) == generalize(b, a)


@given(st.sampled_from(TYPES), st.sampled_from(TYPES), st.sampled_from(TYPES))
def test_generalize_associative(a, b, c):
    assert generalize(generalize(a, b), c) == generalize(a, generalize(b, c))


@given(st.sampled_from(TYPES))
def test_generalize_idempotent(a):
    assert generalize(a, a) == a
    assert generalize(a, "text") == "text"  # text absorbs


@given(st.text(max_size=30))
def test_deduce_total(s):
    assert deduce_from_string(s) in TYPES


@given(st.integers(min_value=-(2 ** 70), max_value=2 ** 70))
def test_deduce_int_roundtrip_widens_only(n):
    t = deduce_from_string(str(n))
    assert t in ("smallint", "integer", "bigint", "double")
    # the deduced domain always contains the value
    bounds = {"smallint": 2 ** 15, "integer": 2 ** 31, "bigint": 2 ** 63}
    if t in bounds:
        assert abs(n) < bounds[t]


_TS = st.datetimes(min_value=datetime(2000, 1, 2),
                   max_value=datetime(2030, 12, 30)).map(
    lambda d: d.replace(tzinfo=timezone.utc))
_GRAN = st.sampled_from(["15m", "1h", "1d", "1w", "1month"])


@settings(max_examples=200)
@given(_TS, _GRAN)
def test_truncate_idempotent(ts, g):
    gran = Granularity(g)
    once = gran.truncate(ts)
    assert gran.truncate(once) == once
    assert once <= ts


@settings(max_examples=200)
@given(_TS, _GRAN)
def test_inc_decr_inverse_on_bucket_starts(ts, g):
    gran = Granularity(g)
    b = gran.truncate(ts)
    assert gran.decr(gran.inc(b)) == b
    assert gran.inc(b) > b


@settings(max_examples=100)
@given(_TS, _GRAN)
def test_range_covers_and_steps(ts, g):
    gran = Granularity(g)
    end = gran.inc(gran.inc(gran.truncate(ts)))
    buckets = gran.range(ts, end)
    assert buckets[0] == gran.truncate(ts)
    assert buckets[-1] == end
    assert all(gran.inc(a) == b for a, b in zip(buckets, buckets[1:]))


_SPARK_TYPES = st.sampled_from(
    ["smallint", "integer", "bigint", "double", "text", "boolean",
     "timestamp"])


def _schema(names_types):
    from pyspark.sql import types as T

    from python_minerva_etl_spark.datatype import SPARK_TYPES
    return T.StructType([
        T.StructField(n, SPARK_TYPES[t], True) for n, t in names_types])


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.sampled_from("abcdef"), _SPARK_TYPES,
                       min_size=0, max_size=6),
       st.dictionaries(st.sampled_from("abcdef"), _SPARK_TYPES,
                       min_size=0, max_size=6))
def test_schema_diff_properties(old, new):
    from python_minerva_etl_spark.datatype import generalize, schema_diff

    so, sn = _schema(sorted(old.items())), _schema(sorted(new.items()))
    rep = schema_diff(so, sn)
    # self-diff is empty
    assert schema_diff(so, so) == []
    by_col = {r["column"]: r for r in rep}
    assert len(by_col) == len(rep)  # one row per column
    for name in set(old) | set(new):
        if name not in old:
            assert by_col[name]["change"] == "added"
        elif name not in new:
            assert by_col[name]["change"] == "removed"
        elif old[name] == new[name]:
            assert name not in by_col
        else:
            change = by_col[name]["change"]
            if change == "widened":
                assert generalize(old[name], new[name]) == new[name]
            elif change == "narrowed":
                assert generalize(old[name], new[name]) == old[name]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200), st.integers(min_value=1, max_value=32),
       st.integers(min_value=1, max_value=5))
def test_fake_frame_splitter_properties(payload, frame_bytes, every_n):
    from python_minerva_etl_spark.ext.multimodal import _fake_split_frames

    all_frames = _fake_split_frames(payload, frame_bytes, 1)
    kept = _fake_split_frames(payload, frame_bytes, every_n)
    # demux with every_n=1 reconstructs the payload exactly
    assert b"".join(all_frames) == payload
    # sampling keeps exactly the [::every_n] subsequence
    assert kept == all_frames[::every_n]
    # every frame except possibly the last is full-size
    assert all(len(f) == frame_bytes for f in all_frames[:-1])


@settings(max_examples=300)
@given(st.dictionaries(st.integers(min_value=0, max_value=15),
                       st.one_of(st.none(),
                                 st.integers(min_value=-100, max_value=100)),
                       max_size=16),
       st.integers(min_value=1, max_value=16))
def test_exclusive_carry_max_matches_model(maxima, n):
    from python_minerva_etl_spark.operators.ranking import exclusive_carry_max

    carry = exclusive_carry_max(maxima, n)
    assert set(carry) == set(range(n))
    for b in range(n):
        earlier = [maxima[i] for i in range(b)
                   if i in maxima and maxima[i] is not None]
        assert carry[b] == (max(earlier) if earlier else None)


@settings(max_examples=300)
@given(st.lists(st.one_of(st.integers(min_value=-10**12, max_value=10**12),
                          st.text(max_size=12)),
                min_size=0, max_size=50),
       st.one_of(st.integers(min_value=-10**12, max_value=10**12),
                 st.text(max_size=12)))
def test_bloom_no_false_negatives(values, probe):
    from python_minerva_etl_spark.storage.snaptable import (
        _bloom_may_contain, _bloom_positions)

    bits = 0
    for v in values:
        for pos in _bloom_positions(v):
            bits |= 1 << pos
    bloom_hex = f"{bits:x}"
    # every inserted value must report present
    for v in values:
        assert _bloom_may_contain(bloom_hex, v)
    # a probe absent from the set may false-positive but must never
    # crash; the empty filter rejects everything
    if not values:
        assert not _bloom_may_contain("0", probe)
