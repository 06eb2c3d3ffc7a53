"""The primary gate: every declared query must match its DuckDB oracle
bit-for-bit at sf0.01 (mirrors the driver's t2 check)."""

from __future__ import annotations

import pytest

from python_minerva_etl_spark.queries.catalog import all_queries

from .compare import diff_frames, run_oracle
from .conftest import SF_CORRECT

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_declared_query_matches_oracle(spark, name):
    q = _QUERIES[name]
    sdf = q.spark(spark, SF_CORRECT)
    spark_pd = sdf.toPandas()
    if q.oracle is None:
        # rows-only contract: runs, stable schema, deterministic count
        assert spark_pd.shape[0] >= 0
        again = q.spark(spark, SF_CORRECT).toPandas()
        assert len(again) == len(spark_pd), "rows-only query is nondeterministic"
        return
    oracle_pd = run_oracle(q.oracle, SF_CORRECT)
    problems = diff_frames(spark_pd, oracle_pd)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 2


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 8


def test_all_queries_run_at_smoke_scale(spark):
    """Scale-independence smoke: every declared query must run at
    sf0.001 too (no hidden assumptions about fixture sizes)."""
    for name, q in sorted(_QUERIES.items()):
        n = q.spark(spark, "/root/testdata/sf0.001").count()
        assert n >= 0, name


def test_catalog_names_match_local_artifact():
    """Process guard (round-3 VERDICT item 8): every declared query
    must have a row in the committed full-catalog parity artifact
    (CORRECTNESS_LOCAL.json) — a new DeclaredQuery landing without
    `python scripts/correctness_local.py` being re-run in the same
    commit fails here, and a stale artifact row for a deleted query
    fails too."""
    import json
    import os

    art = os.path.join(os.path.dirname(__file__), "..",
                       "CORRECTNESS_LOCAL.json")
    rows = json.load(open(art))
    declared = set(_QUERIES)
    recorded = {k for k in rows if not k.startswith("_")}
    missing = sorted(declared - recorded)
    stale = sorted(recorded - declared)
    assert not missing, (
        f"declared queries missing parity rows (regenerate "
        f"CORRECTNESS_LOCAL.json): {missing}")
    assert not stale, f"artifact rows for deleted queries: {stale}"
    bad = sorted(k for k, v in rows.items() if not k.startswith("_")
                 and not v.get("no_oracle")
                 and not (v.get("rows_match") and v.get("schema_match")
                          and v.get("hash_match")))
    assert not bad, f"non-green parity rows committed: {bad}"
