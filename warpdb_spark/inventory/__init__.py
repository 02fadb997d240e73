"""Driver-facing query inventory.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (ANSI SQL for DuckDB).
``__spark_entry__.py`` aggregates them. Naming convention: the prefix
states the SURVEY §2 operator family the entry covers.

Entry ORDER matters: the driver's per-round correctness gate verifies a
bounded window from the front of the ``queries()`` dict (~50 entries per
round). ``DRIVER_PRIORITY`` lists the entries that most need fresh
driver verification THIS round, rotated each round so every entry gets a
driver-green row. Round-4 rotation: the round-3 driver run produced no
correctness artifacts, so the full r3 rotation — (a) the 12 events
entries recovered by the schema-adaptive ts fix, (b) ``tpch_q12`` after
its oracle BIGINT cast, (c) the 17 r2 additions never in a window,
(d) upgraded-oracle entries (ANN replay, fixed-iteration kmeans,
QUALIFY) — stays pending and keeps its slots, joined by (d3) the
round-4 additions (sessionize/LOCF-resample/mode-median/unpivot/
edit-distance/dialect-setops/intersect-all/dialect q3+q12/weighted
sample/z-score outliers). 52 pending entries front the window (the
last two may spill to r5 if the driver cuts at exactly 50). Everything
else follows
in module order, still guarded by the local oracle gate
(tools/check_oracle.py) + pytest.
"""

from __future__ import annotations

# Front-of-dict entries for the driver's bounded correctness window.
# Names listed here are emitted first (in this order); anything not
# listed follows in module order. A name that no longer exists is an
# error — the list must track the inventory.
DRIVER_PRIORITY: list[str] = [
    # (a) events entries — all broke when the testdata's ts encoding
    # changed (r2 driver err rows); fixed by the schema-adaptive reader
    "reshape_pivot",
    "json_extract_props",
    "asof_join_clicks_purchases",
    "range_join_value_bands",
    "stream_interval_join_attribution",
    "stream_tumbling_hourly",
    "stream_sliding_2h",
    "stream_session_windows",
    "window_lag_lead",
    "window_frame_moving_avg",
    "events_funnel_conversion",
    "events_cohort_retention",
    # (b) r2 hash-fail, oracle CAST fixed
    "tpch_q12_priority_lines",
    # (c) r2 additions never in any driver window
    "agg_grouping_sets",
    "window_value_functions",
    "pack_sequences_chunked",
    "sample_stratified",
    "decontam_eval_overlap",
    "text_repetition_stats",
    "text_vocab_oov",
    "text_gopher_rules",
    "text_unigram_logprob",
    "embedding_quantize_int8",
    "embedding_kmeans_assign",
    "embedding_kmeans_clusters",
    "reshape_chunk_documents",
    "join_salted_skew",
    "pipeline_corpus_curation",
    # (c2) TPC-H q2/q7/q8 — added mid-r2 AFTER the r1 window closed and
    # absent from the r2 window: never driver-checked either
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    # (d) upgraded or added this round: ANN full-replay oracles (were
    # no_oracle), QUALIFY, forward as-of, approx-percentile, event-time
    # dialect
    "similarity_ann_lsh",
    "similarity_ivf",
    "window_qualify",
    "asof_join_next_purchase",
    "agg_approx_percentile",
    "dialect_event_time",
    # (d2) also new this round: dialect TPC-H variants (q1 doubles as the
    # q1 reconfirmation — same ground truth, stronger path) and the
    # corpus accounting entry
    "dialect_tpch_q1",
    "dialect_tpch_q6",
    "corpus_stats_by_stratum",
    "dedup_span_boilerplate",
    # (d3) round-4 additions (r3 produced no driver artifacts, so the
    # whole r3 rotation above is still pending; these join it):
    # sessionization/backfill analytics, LOCF resample, ordered-set
    # aggregates, unpivot, blocked edit-distance, dialect set-ops, and
    # the INTERSECT ALL entry that landed after the r3 rotation
    # Slot-50 note: ~55 entries above the (e) block compete for a ~50
    # window; NOVEL operator families rank before dialect/set-op
    # re-expressions of ground truths that already have driver-green
    # DataFrame twins (tpch_q3/q12, setop family) — those spill to the
    # next rotation if the driver cuts at exactly 50, still guarded by
    # the local oracle gate + the dialect property fuzzes.
    "events_sessionize",
    "events_resample_locf",
    "agg_mode_median",
    "reshape_unpivot",
    "text_edit_distance_pairs",
    "sample_weighted",
    "events_zscore_outliers",
    # (d4) late round-3 additions: corpus n-gram stats, token-budget
    # data-mixture sampling (two-level cumsum path), incremental dedup
    "text_top_bigrams",
    "sample_token_budget",
    "dedup_incremental_new_docs",
    "events_anomaly_mad",
    "dialect_setops",
    "setop_intersect_all",
    "dialect_tpch_q3",
    "dialect_tpch_q12",
    # (d5) round-3 analytics/warehouse-maintenance additions
    # (inventory/analytics_ext.py): novel operator families, ranked
    # before the (e) re-confirmations
    "dialect_rollup_grouping",
    "dialect_grouping_sets",
    "merge_upsert_orders",
    "scd2_event_intervals",
    "table_diff_cdc",
    "events_equidepth_quantiles",
    "events_equidepth_approx",
    "embedding_pq_codes",
    "similarity_pq_adc",
    "similarity_pq_rerank",
    "stream_static_enrich",
    "profile_table_columns",
    "table_fingerprint",
    "stats_correlation_matrix",
    "window_distinct_count",
    "events_value_histogram",
    "events_rollup_cascade",
    # (d6) retrieval / semantic-curation additions
    # (inventory/retrieval_ops.py): BM25 lexical retrieval, SemDeDup,
    # HLL sketch union, linear-interpolation resample
    "text_bm25_search",
    "dedup_semantic_semdedup",
    "agg_hll_union_days",
    "events_resample_interpolate",
    "graph_pagerank_users",
    "search_hybrid_rrf",
    "dialect_range_interval_frame",
    "dialect_recursive_cte",
    "dialect_self_join",
    "multimodal_ppm_decode",
    "multimodal_wav_decode",
    "dialect_agg_filter",
    "dialect_string_agg",
    "dialect_unnest",
    "embedding_contrastive_pairs",
    "multimodal_video_frames",
    # (d7) third-session additions (inventory/scale_ops.py): triangle
    # counting, truncated EWMA, hashed linear quality scorer, two-phase
    # global ordinal — novel operator families, never driver-checked
    "graph_triangle_count",
    "graph_adamic_adar",
    "similarity_mmr_rerank",
    "dedup_containment_ngram",
    "events_user_rfm",
    "events_ewma_smooth",
    "text_quality_classifier",
    "sketch_countmin_words",
    "text_subword_segment",
    "events_trend_ols",
    "events_markov_transitions",
    "text_perplexity_bigram",
    "range_join_session_overlap",
    "dialect_distinct_on",
    "window_ignore_nulls",
    "dialect_ansi_fetch_bool",
    "dialect_array_agg",
    "dialect_broadcast_hint",
    "dialect_select_star",
    "dialect_group_by_all",
    "dialect_json_arrow",
    "reshape_global_ordinal",
    # (e) re-confirm a cross-family sample of prior driver-greens with
    # the remaining window slots
    "flagship_filter_project",
    "dialect_expression_projection",
    "dialect_cte_scalar_in",
    "window_running_sum",
    "window_rank_family",
    "setop_except_all",
    "udaf_group_median",
    "tpch_q3_shipping_priority",
    "dedup_minhash_lsh",
]


def load_all():
    from warpdb_spark.inventory import (
        analytics_ext,
        core_sql,
        pipeline_ops,
        retrieval_ops,
        scale_ops,
        tpch_extra,
    )

    merged_q: dict = {}
    merged_o: dict = {}
    for m in (core_sql, tpch_extra, pipeline_ops, analytics_ext, retrieval_ops, scale_ops):
        merged_q.update(m.QUERIES)
        merged_o.update(m.ORACLES)

    missing = [n for n in DRIVER_PRIORITY if n not in merged_q]
    if missing:
        raise RuntimeError(f"DRIVER_PRIORITY names not in inventory: {missing}")

    queries: dict = {n: merged_q[n] for n in DRIVER_PRIORITY}
    queries.update((n, q) for n, q in merged_q.items() if n not in queries)
    oracles: dict = {n: merged_o[n] for n in queries if n in merged_o}
    return queries, oracles
