"""The declared-query catalog — aggregates every query module.

``__spark_entry__.py`` (the driver contract) is a thin shim over this.

Ordering contract: the driver verifies the first 50 catalog entries
against their DuckDB oracles (CORRECTNESS window).  ``_WINDOW`` below
rotates every round.  Round 11 leads with the round's three NEW
queries (the sorted-neighborhood candidate-bounded dedup twins —
two rows-only by design, one md5-based and ORACLE-VERIFIED), then
the r10 verdict's three bench movers
(``agg_time_1h``/``agg_time_1d``/``rollup_entity`` — untouched code,
contended-box evidence; a driver-side correctness datapoint closes
the loop), then a 45-entry LEAST-RECENTLY-OFFERED rotation picked by
``scripts/window_ledger.py --stalest`` from the committed
CORRECTNESS_r* history: the last r3 entry and the r4-last-offered
spine (relational/functions, the r4 stream parities, the span/
containment dedups).  After this round every declared query's last
offer is >= r4, and only three (``data_quality_report``,
``win_time_range_avg``, ``agg_benford``) predate r5 — they lead the
r12 rotation.
Everything else — previously driver-verified — sits after it in
``_DEPTH``.  Both lists are validated against the modules' QUERIES
at import time — a missing or unknown name raises.
"""

from __future__ import annotations

from .base import DeclaredQuery

# The driver's correctness window.  Keep this at <= 50 entries.
_WINDOW = [
    "dedup_simhash_neighbors",
    "dedup_minhash_neighbors",
    "dedup_simhash_neighbors_verified",
    "agg_time_1h",
    "agg_time_1d",
    "rollup_entity",
    "win_delta_prev",
    "agg_conditional",
    "agg_distinct_reagg",
    "agg_navigated_1d",
    "attr_compact",
    "cohort_retention",
    "corpus_quality_prune",
    "dataset_leakage_safe_split",
    "dataset_pack_sequences",
    "dedup_containment",
    "dedup_source_matrix",
    "dedup_spans",
    "dn_reparent",
    "entity_fuzzy_match",
    "event_transitions",
    "filter_time_range",
    "fn_array_ops",
    "fn_date_bucket_series",
    "fn_kpi_math",
    "fn_map_ops",
    "fn_string_dn",
    "graph_reach",
    "join_anti_null_aware",
    "join_asof_nearest",
    "join_left",
    "join_salted_hot_keys",
    "join_semi",
    "json_extract",
    "mm_frame_sample",
    "notif_escalation",
    "project_select",
    "rank_global",
    "set_except",
    "set_union",
    "stream_enrich_parity",
    "stream_session_parity",
    "stream_sliding_parity",
    "text_heavy_hitters",
    "text_langid_confusion",
    "text_redact",
    "topk_worst",
    "win_counter_rate",
    "win_fill_forward",
    "win_rank_topn",
]

_DEPTH = [
    "win_time_range_avg",
    "agg_benford",
    "data_quality_report",
    "dedup_near_pairs_capped",
    "sink_iceberg_zorder_partitioned",
    "text_c4_rules",
    "win_moving_avg",
    "agg_reagg_avg",
    "dataset_dsir_select",
    "stream_avro_ingest_parity",
    "stream_delta_source_parity",
    "stream_iceberg_upsert_parity",
    "agg_corr_exact",
    "agg_histogram",
    "agg_percentiles",
    "agg_rollup_sets",
    "agg_string_concat",
    "agg_time_15m",
    "agg_time_1month",
    "agg_time_1w",
    "agg_variance_exact",
    "gap_detect",
    "reshape_long",
    "reshape_wide",
    "set_intersect",
    "win_distribution",
    "win_first_last",
    "win_next_event_gap",
    "win_running_total",
    "text_fingerprint",
    "agg_count_distinct",
    "attr_change_detect",
    "attr_curr",
    "dataset_hash_split",
    "dedup_embedding_pairs",
    "dedup_near_pairs",
    "dn_parse",
    "entity_resolve",
    "events_sessionize",
    "join_anti",
    "mm_passthrough",
    "notif_window_count",
    "sort_report",
    "stream_join_parity",
    "stream_tumble_parity",
    "table_changes",
    "text_chunk",
    "text_langid",
    "text_token_stats",
    "trigger_threshold",
    "upsert_last_wins",
    "source_avro_zstd_roundtrip",
    "stream_iceberg_pruned_delete_parity",
    "text_gopher_ngrams",
    "text_gopher_lines",
    "text_gopher_quality",
    "join_asof",
    "join_inner",
    "dedup_simhash_verified",
    "text_quality_score",
    "avro_ingest",
    "source_avro_roundtrip",
    "sink_iceberg_eqdelete_roundtrip",
    "source_iceberg_eqdelete_datasource",
    "sink_delta_dv_roundtrip",
    "sink_delta_merge_roundtrip",
    "sink_delta_replace_where",
    "source_delta_cdf",
    "source_delta_cdf_update",
    "source_delta_cdf_datasource",
    "sink_iceberg_merge_roundtrip",
    "sink_iceberg_days_partitioned",
    "source_iceberg_incremental",
    "upsert_merge_table",
    "cdc_incremental_agg",
    "dedup_minhash_pairs_verified",
    "materialize_incremental",
    "skyline_orders",
    "intervals_merge",
    "peak_concurrency",
    "seq_gap_ranges",
    "stream_trigger_parity",
    "agg_mode",
    "agg_arg_extremes",
    "agg_time_weighted_avg",
    "agg_pctl_from_hist",
    "agg_salted_hot_keys",
    "anomaly_cusum",
    "win_streaks",
    "agg_moments",
    "trend_fit",
    "rfm_segmentation",
    "rolling_active_users",
    "mm_decode_png",
    "mm_decode_wav",
    "dedup_simhash",
    "text_hash_embed",
    "dedup_exact",
    "agg_time_sliding",
    "agg_busy_hour",
    "agg_cube",
    "agg_weighted_median",
    "win_drawdown",
    "win_ewma",
    "win_rolling_zscore",
    "join_range",
    "join_asof_forward",
    "join_asof_tolerance",
    "anomaly_mad",
    "notif_storm_collapse",
    "gap_fill",
    "funnel_conversion",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_semantic",
    "sim_topk",
    "text_tfidf_topk",
    "dataset_fingerprint",
    "corpus_filter_funnel",
    "mm_decode_jpeg",
    "mm_resize",
    "stream_dedup_parity",
    "events_session_window",
    "agg_time_localtz",
    "rollup_relation",
    "sink_delta_roundtrip",
    "agg_user_growth",
    "gap_interpolate",
    "anomaly_zscore",
    "store_staleness",
    "path_signatures",
    "report_abc_class",
    "clean_winsorize",
    "late_data_report",
    "backlog_over_time",
    "events_burstiness",
    "order_latency_percentiles",
    "interarrival_percentiles",
    "report_week_movers",
    "mm_wav_frames",
    "agg_approx_distinct",
    "anomaly_prefix_zscore",
    "stream_anomaly_feed",
    "text_boilerplate",
    "dataset_interleave",
    "win_ratio_to_report",
    "dataset_reservoir_sample",
    "embedding_health",
    "agg_activity_bitmap",
    "agg_gini",
    "agg_autocorr_lag1",
    "corpus_token_budget",
    "agg_churn_rate",
    "agg_retention_curve",
    "dataset_stratified_sample",
    "dataset_temperature_sample",
    "dataset_cluster_balance",
    "dataset_shuffle",
    "dataset_contamination",
    "text_repetition",
    "text_vocab_topk",
    "text_fertility",
    "dataset_mix_epochs",
    "dataset_length_buckets",
    "text_diversity",
    "text_bigram_score",
    "dedup_keep_canonical",
    "text_dup_rate",
    "agg_hll_reagg",
    "dedup_minhash_pairs",
    "dedup_incremental",
    "dedup_embedding_lsh",
    "embedding_centroids",
    "embedding_quantize",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_arrow",
    "sim_topk_pq",
    "dedup_embedding_pivot",
    "dedup_semantic_indexed",
    "sink_iceberg_roundtrip",
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
