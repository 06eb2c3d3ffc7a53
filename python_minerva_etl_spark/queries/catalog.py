"""The declared-query catalog — aggregates every query module.

``__spark_entry__.py`` (the driver contract) is a thin shim over this.

Ordering contract: the driver verifies the first 50 catalog entries
against their DuckDB oracles (CORRECTNESS window).  ``_WINDOW`` below
pins exactly one oracle-backed representative of every SURVEY.md §2
operator family (plus every §2.11 LLM-pipeline op) inside that window;
within-family depth variants and rows-only (no-oracle) approximate ops
sit after it in ``_DEPTH``.  Both lists are validated against the
modules' QUERIES at import time — a missing or unknown name raises.
"""

from __future__ import annotations

from .base import DeclaredQuery

# One oracle-backed representative per operator family — the driver's
# correctness window.  Keep this at <= 50 entries.
_WINDOW = [
    # §2.4 time/partial/distinct/filtered aggregation
    "agg_time_1h",
    "agg_reagg_avg",
    "agg_count_distinct",
    "agg_conditional",
    # §2.2 projection / filter / json / dn / entity
    "project_select",
    "filter_time_range",
    "json_extract",
    "dn_parse",
    "entity_resolve",
    "fn_map_ops",
    # §2.3 joins + relation rollup
    "join_inner",
    "join_left",
    "join_semi",
    "join_anti",
    "rollup_relation",
    "join_asof",
    # §2.6 sort / top-k / set ops
    "sort_report",
    "topk_worst",
    "set_union",
    "set_except",
    # §2.7 scalar function families
    "fn_date_bucket_series",
    "fn_string_dn",
    "fn_kpi_math",
    "fn_array_ops",
    # §2.5 attribute store / windows
    "attr_curr",
    "attr_change_detect",
    "attr_compact",
    "win_rank_topn",
    "win_delta_prev",
    "win_moving_avg",
    # §2.8 trigger / notification
    "trigger_threshold",
    "notif_window_count",
    # §2.9 sessionize / streaming / materialization / upsert / CDC
    "events_sessionize",
    "stream_join_parity",
    "upsert_last_wins",
    "stream_tumble_parity",
    "materialize_incremental",
    "table_changes",
    # §2.11 dedup / similarity / text / multimodal extensions
    "dedup_exact",
    "dedup_near_pairs",
    "dedup_spans",
    "dedup_embedding_pairs",
    "sim_topk",
    "text_token_stats",
    "text_quality_score",
    "text_langid",
    "text_chunk",
    "text_redact",
    "dataset_hash_split",
    "mm_passthrough",
]

# Within-family depth + rows-only approximate twins.  Same local test
# rigor (tests/test_oracle_diff.py runs ALL queries), just outside the
# driver's window because their family already has a green row above.
_DEPTH = [
    "upsert_merge_table",
    "cdc_incremental_agg",
    "rollup_entity",
    "agg_rollup_sets",
    "agg_cube",
    "seq_gap_ranges",
    "agg_time_15m",
    "agg_time_sliding",
    "stream_sliding_parity",
    "stream_dedup_parity",
    "stream_enrich_parity",
    "stream_trigger_parity",
    "stream_session_parity",
    "events_session_window",
    "agg_time_1d",
    "agg_time_1w",
    "agg_time_1month",
    "agg_busy_hour",
    "agg_time_localtz",
    "agg_mode",
    "agg_arg_extremes",
    "agg_user_growth",
    "agg_time_weighted_avg",
    "agg_percentiles",
    "agg_variance_exact",
    "agg_string_concat",
    "agg_corr_exact",
    "agg_histogram",
    "agg_pctl_from_hist",
    "agg_salted_hot_keys",
    "gap_detect",
    "data_quality_report",
    "entity_fuzzy_match",
    "dn_reparent",
    "gap_fill",
    "gap_interpolate",
    "anomaly_zscore",
    "anomaly_mad",
    "anomaly_prefix_zscore",
    "stream_anomaly_feed",
    "notif_escalation",
    "cohort_retention",
    "funnel_conversion",
    "text_boilerplate",
    "dataset_interleave",
    "set_intersect",
    "rank_global",
    "join_range",
    "join_asof_forward",
    "join_asof_tolerance",
    "join_anti_null_aware",
    "join_asof_nearest",
    "win_drawdown",
    "win_counter_rate",
    "win_running_total",
    "win_time_range_avg",
    "win_distribution",
    "win_first_last",
    "win_next_event_gap",
    "win_streaks",
    "win_ratio_to_report",
    "win_rolling_zscore",
    "win_ewma",
    "event_transitions",
    "agg_moments",
    "graph_reach",
    "notif_storm_collapse",
    "store_staleness",
    "dedup_containment",
    "anomaly_cusum",
    "path_signatures",
    "dataset_reservoir_sample",
    "report_abc_class",
    "embedding_health",
    "join_salted_hot_keys",
    "agg_distinct_reagg",
    "trend_fit",
    "clean_winsorize",
    "agg_activity_bitmap",
    "rfm_segmentation",
    "win_fill_forward",
    "rolling_active_users",
    "late_data_report",
    "backlog_over_time",
    "text_hash_embed",
    "dedup_source_matrix",
    "agg_gini",
    "agg_autocorr_lag1",
    "events_burstiness",
    "agg_navigated_1d",
    "text_heavy_hitters",
    "intervals_merge",
    "peak_concurrency",
    "order_latency_percentiles",
    "interarrival_percentiles",
    "agg_benford",
    "report_week_movers",
    "dataset_fingerprint",
    "agg_weighted_median",
    "corpus_token_budget",
    "agg_churn_rate",
    "agg_retention_curve",
    "skyline_orders",
    "reshape_wide",
    "reshape_long",
    "dataset_stratified_sample",
    "dataset_temperature_sample",
    "dedup_semantic",
    "dataset_cluster_balance",
    "dataset_pack_sequences",
    "dataset_shuffle",
    "dataset_contamination",
    "text_repetition",
    "text_vocab_topk",
    "text_fertility",
    "text_tfidf_topk",
    "corpus_filter_funnel",
    "corpus_quality_prune",
    "dataset_mix_epochs",
    "dataset_length_buckets",
    "text_diversity",
    "text_bigram_score",
    "dedup_clusters",
    "dedup_keep_canonical",
    "dataset_leakage_safe_split",
    "text_dup_rate",
    "dedup_ngram_jaccard",
    "text_fingerprint",
    "text_langid_confusion",
    "agg_approx_distinct",
    "agg_hll_reagg",
    "dedup_minhash_pairs",
    "dedup_incremental",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "embedding_centroids",
    "mm_frame_sample",
    "embedding_quantize",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_arrow",
    "sim_topk_pq",
]


def all_queries() -> dict[str, DeclaredQuery]:
    # All modules ship since round 1 — import failures must surface,
    # not silently shrink the declared catalog.
    from . import (aggregation, ext_sim, ext_text, relational,  # noqa: F401
                   streaming_q, trend, windows)

    by_name: dict[str, DeclaredQuery] = {}
    for mod in (aggregation, relational, windows, trend, ext_text,
                ext_sim, streaming_q):
        for q in mod.QUERIES:
            if q.name in by_name:
                raise ValueError(f"duplicate declared query {q.name!r}")
            by_name[q.name] = q

    order = _WINDOW + _DEPTH
    if len(_WINDOW) > 50:
        raise ValueError(
            f"correctness window overflows: {len(_WINDOW)} > 50 entries")
    missing = [n for n in order if n not in by_name]
    undeclared = sorted(set(by_name) - set(order))
    dupes = [n for n in order if order.count(n) > 1]
    if missing or undeclared or dupes:
        raise ValueError(
            f"catalog order out of sync: missing={missing} "
            f"undeclared={undeclared} duplicated={sorted(set(dupes))}")
    return {name: by_name[name] for name in order}
