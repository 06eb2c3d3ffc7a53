"""bench.py harness logic — the perf half of the contract is now
gated by this code (contention gate, prior-round unwrap, dynamic
repass selection), so its pure parts are pinned here.  No Spark.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402

pytestmark = pytest.mark.quick


def test_prior_bench_unwraps_driver_envelope(tmp_path, monkeypatch):
    """The driver wraps the bench JSON line under 'parsed' (next to
    the raw 'tail'); _prior_bench must unwrap it and pick the
    highest round."""
    inner9 = {"value": 10.0, "sf": 0.1, "queries": {"q": 1.0},
              "spread": {"q": 0.1}}
    inner10 = {"value": 12.0, "sf": 0.1, "queries": {"q": 1.5},
               "spread": {"q": 0.2}}
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"n": 9, "tail": "...", "parsed": inner9}))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(inner10))
    (tmp_path / "BENCH_r02.json").write_text("{not json")
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    assert bench._prior_bench() == inner10


def test_prior_bench_skips_shapeless_files(tmp_path, monkeypatch):
    """A newest artifact without a queries dict (a failed run) must
    not shadow an older usable one."""
    good = {"value": 10.0, "sf": 0.1, "queries": {"q": 1.0},
            "spread": {}}
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(good))
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"n": 10, "rc": 1, "tail": "crash"}))
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    assert bench._prior_bench() == good


def test_select_movers_thresholds():
    prior = {"queries": {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
             "spread": {"a": 0.05, "b": 0.5, "c": 0.05}}
    medians = {"a": 1.3,   # delta .3 > max(.05,.05,.15) -> mover
               "b": 1.3,   # delta .3 < prior spread .5 -> not
               "c": 1.1,   # delta .1 < floor .15 -> not
               "d": 1.2,   # delta .2 > floor (no spreads) -> mover
               "e": 9.9}   # not in prior -> never
    spreads = {"a": 0.05, "b": 0.05, "c": 0.05, "d": 0.0, "e": 0.0}
    assert bench._select_movers(medians, spreads, prior) == ["a", "d"]


def test_select_movers_own_spread_suppresses():
    prior = {"queries": {"a": 1.0}, "spread": {"a": 0.05}}
    assert bench._select_movers({"a": 1.4}, {"a": 0.6}, prior) == []


def test_select_movers_empty_prior():
    assert bench._select_movers({"a": 1.0}, {"a": 0.1}, {}) == []


def test_compact_line_bounded_and_contractual():
    """r12 verdict item 2: the printed line must stay under ~4 KB at
    30 queries (the r11 line with embedded retry evidence outgrew the
    driver's tail capture and was truncated, nulling every prev_sec
    in PERF_r12) and must keep the driver-contract fields."""
    meds = {f"query_name_{i:02d}": round(0.1234 + i, 4)
            for i in range(30)}
    sprs = {k: 0.1234 for k in meds}
    line = bench._compact_line(12.3456, meds, sprs, 0.1, False)
    assert {"metric", "value", "unit", "queries", "sf"} <= set(line)
    assert line["queries"] == meds
    assert len(json.dumps(line)) < 4096


def test_gate_constants_sane():
    """The gate must trip on the r10 evidence (2.63 s leading probe)
    and pass the committed quiet range (~0.7-1.0 s)."""
    thr = bench.GATE_FACTOR * bench.QUIET_REBASELINE_SEC
    assert 2.63 > thr
    assert 0.97 < thr < 1.16  # r11's observed pass/retry boundary


def test_measure_retry_adopted_only_when_quiet(monkeypatch):
    """r11 advice + r12 hardening: a noisy first attempt earns gated
    retries; the first attempt whose OWN spread clears the noisy
    threshold wins.  If every attempt is noisy the tightest one is
    kept and the record marks the figure as measured through load."""
    monkeypatch.setattr(bench, "_regate",
                        lambda spark: {"rebaseline_gate": [2.1, 0.8],
                                       "contended": False,
                                       "rebaseline_sec": 0.8})

    # all noisy -> tightest kept, quiet=False, all attempts on record
    attempts = iter([(1.0, 0.9), (1.2, 0.8), (1.4, 0.85), (1.1, 0.9)])
    monkeypatch.setattr(bench, "_measure_once",
                        lambda *a, **k: next(attempts))
    rec: list = []
    med, spr = bench._measure(None, {"q": object()}, "q", "sf", rec)
    assert (med, spr) == (1.2, 0.8)             # tightest spread
    assert rec[0]["kept"] == "attempt1"
    assert rec[0]["quiet"] is False
    assert len(rec[0]["attempts"]) == 1 + bench.NOISY_MAX_RETRIES
    assert rec[0]["regates"] == [[2.1, 0.8]] * bench.NOISY_MAX_RETRIES

    # second retry quiet -> adopted, no further retries
    attempts = iter([(1.0, 0.9), (1.2, 0.8), (0.8, 0.05)])
    monkeypatch.setattr(bench, "_measure_once",
                        lambda *a, **k: next(attempts))
    rec = []
    med, spr = bench._measure(None, {"q": object()}, "q", "sf", rec)
    assert (med, spr) == (0.8, 0.05)
    assert rec[0]["kept"] == "attempt2"
    assert rec[0]["quiet"] is True
    assert len(rec[0]["attempts"]) == 3

    # quiet first attempt -> no retry, no record
    monkeypatch.setattr(bench, "_measure_once",
                        lambda *a, **k: (1.0, 0.1))
    rec = []
    assert bench._measure(None, {"q": object()}, "q", "sf", rec) == \
        (1.0, 0.1)
    assert rec == []
