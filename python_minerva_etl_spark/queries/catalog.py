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
#
# ROTATION (round 4): the driver independently verifies only the first
# 50 catalog entries each round; rounds 1-3 verified 73 distinct
# queries.  This round swaps every family representative that has a
# never-driver-verified oracle-backed sibling for that sibling — 31 of
# the 50 entries below ("r4" marks) have no prior driver CORRECTNESS
# row.  The 19 unmarked entries are families with a single oracle-
# backed member, which must repeat to keep the family invariant.
# Rounds 1-3 windows remain in _DEPTH and in the full-catalog local
# artifact (CORRECTNESS_LOCAL.json, tests/test_oracle_diff.py).
_WINDOW = [
    "agg_time_localtz",               # OP-AGG-TIME (deployment tz)      r4
    "agg_navigated_1d",               # OP-AGG-PARTIAL (navigation)      r4
    "agg_distinct_reagg",             # OP-AGG-DISTINCT (exact re-agg)   r4
    "agg_conditional",                # OP-AGG-FILTER
    "project_select",                 # OP-PROJ
    "filter_time_range",              # OP-FILT
    "json_extract",                   # OP-JSON/OP-F-JSON
    "dn_reparent",                    # OP-DIR-DN (subtree move)         r4
    "entity_fuzzy_match",             # OP-DIR-ENTITY (fuzzy alias)      r4
    "fn_map_ops",                     # OP-F-MAP
    "join_salted_hot_keys",           # OP-JOIN-EQ (skew/salted)         r4
    "join_left",                      # OP-JOIN-LEFT
    "join_semi",                      # OP-JOIN-SEMI
    "join_anti_null_aware",           # OP-JOIN-ANTI (NOT IN)            r4
    "graph_reach",                    # OP-JOIN-REL (frontier BFS)       r4
    "join_asof_nearest",              # OP-JOIN-ASOF (nearest)           r4
    "rank_global",                    # OP-SORT/OP-RPT (two-phase)       r4
    "topk_worst",                     # OP-LIMIT/TOPK
    "set_union",                      # OP-UNION
    "set_except",                     # OP-EXCEPT
    "fn_date_bucket_series",          # OP-F-DATE
    "fn_string_dn",                   # OP-F-STR
    "fn_kpi_math",                    # OP-F-MATH
    "fn_array_ops",                   # OP-F-ARRAY
    "win_fill_forward",               # OP-WIN-LATEST (fwd fill)         r4
    "event_transitions",              # OP-WIN-CHANGE (transitions)      r4
    "attr_compact",                   # OP-WIN-COMPACT
    "win_rank_topn",                  # OP-WIN-RANK
    "win_counter_rate",               # OP-WIN-ANALYTIC (ctr reset)      r4
    "win_time_range_avg",             # OP-WIN-MOVAVG (RANGE frame)      r4
    "notif_escalation",               # OP-TRIG-THRESH (escalation)      r4
    "cohort_retention",               # OP-NOTIF-QUERY (retention)       r4
    "stream_session_parity",          # OP-STR-SESSION (streaming)       r4
    "stream_enrich_parity",           # OP-STR-INGEST (enrichment)       r4
    "upsert_merge_table",             # OP-SNK-UPSERT (MERGE)            r4
    "stream_sliding_parity",          # OP-STR-TUMBLE (hopping)          r4
    "cdc_incremental_agg",            # OP-MAT-INC + CDC                 r4
    "data_quality_report",            # OP-SNK (contracts)               r4
    "dedup_source_matrix",            # EXT-DEDUP-EXACT (x-source)       r4
    "dedup_containment",              # EXT-DEDUP-NEAR (containment)     r4
    "dedup_spans",                    # EXT-DEDUP (span removal)
    "dedup_semantic",                 # EXT-DEDUP (embedding/SemDeDup)   r4
    "sim_topk",                       # EXT-SIM-TOPK
    "text_heavy_hitters",             # EXT-TEXT-STATS (Misra-Gries)     r4
    "corpus_quality_prune",           # EXT-TEXT (quality pruning)       r4
    "text_langid_confusion",          # EXT-TEXT (lang-id eval)          r4
    "dataset_pack_sequences",         # EXT-TEXT (chunk/pack)            r4
    "text_redact",                    # EXT-TEXT (PII redaction)
    "dataset_leakage_safe_split",     # EXT dataset split            r4
    "mm_frame_sample",                # EXT-MM-COL (1:N decode fan-out)  r4
]

# Within-family depth + rows-only approximate twins.  Same local test
# rigor (tests/test_oracle_diff.py runs ALL queries), just outside the
# driver's window because their family already has a green row above.
_DEPTH = [
    "agg_time_1h",
    "agg_reagg_avg",
    "agg_count_distinct",
    "dn_parse",
    "entity_resolve",
    "join_inner",
    "join_anti",
    "rollup_relation",
    "join_asof",
    "sort_report",
    "attr_curr",
    "attr_change_detect",
    "win_delta_prev",
    "win_moving_avg",
    "trigger_threshold",
    "notif_window_count",
    "events_sessionize",
    "stream_join_parity",
    "upsert_last_wins",
    "stream_tumble_parity",
    "materialize_incremental",
    "table_changes",
    "dedup_exact",
    "dedup_near_pairs",
    "dedup_embedding_pairs",
    "text_token_stats",
    "text_quality_score",
    "text_langid",
    "text_chunk",
    "dataset_hash_split",
    "mm_passthrough",
    "rollup_entity",
    "agg_rollup_sets",
    "agg_cube",
    "seq_gap_ranges",
    "agg_time_15m",
    "agg_time_sliding",
    "stream_dedup_parity",
    "stream_trigger_parity",
    "events_session_window",
    "agg_time_1d",
    "agg_time_1w",
    "agg_time_1month",
    "agg_busy_hour",
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
    "gap_fill",
    "gap_interpolate",
    "anomaly_zscore",
    "anomaly_mad",
    "anomaly_prefix_zscore",
    "stream_anomaly_feed",
    "funnel_conversion",
    "text_boilerplate",
    "dataset_interleave",
    "set_intersect",
    "join_range",
    "join_asof_forward",
    "join_asof_tolerance",
    "win_drawdown",
    "win_running_total",
    "win_distribution",
    "win_first_last",
    "win_next_event_gap",
    "win_streaks",
    "win_ratio_to_report",
    "win_rolling_zscore",
    "win_ewma",
    "agg_moments",
    "notif_storm_collapse",
    "store_staleness",
    "anomaly_cusum",
    "path_signatures",
    "dataset_reservoir_sample",
    "report_abc_class",
    "embedding_health",
    "trend_fit",
    "clean_winsorize",
    "agg_activity_bitmap",
    "rfm_segmentation",
    "rolling_active_users",
    "late_data_report",
    "backlog_over_time",
    "text_hash_embed",
    "agg_gini",
    "agg_autocorr_lag1",
    "events_burstiness",
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
    "dataset_cluster_balance",
    "dataset_shuffle",
    "dataset_contamination",
    "text_repetition",
    "text_vocab_topk",
    "text_fertility",
    "text_tfidf_topk",
    "corpus_filter_funnel",
    "dataset_mix_epochs",
    "dataset_length_buckets",
    "text_diversity",
    "text_bigram_score",
    "dedup_clusters",
    "dedup_keep_canonical",
    "text_dup_rate",
    "dedup_ngram_jaccard",
    "text_fingerprint",
    "agg_approx_distinct",
    "agg_hll_reagg",
    "dedup_minhash_pairs",
    "dedup_incremental",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "embedding_centroids",
    "embedding_quantize",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_arrow",
    "sim_topk_pq",
    "mm_decode_png",
    "mm_decode_wav",
    "mm_wav_frames",
    "sink_delta_roundtrip",
    "dedup_embedding_pivot",
    "dedup_semantic_indexed",
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
