"""Driver-verification rotation bookkeeping (generated mechanically).

``DRIVER_GREEN`` maps each inventory entry that has EVER received a
green row in a driver correctness window (CORRECTNESS_r{N}.json) to
the round of its MOST RECENT green row (last-green, as of r9 —
first-green before that, which made the rotation re-check the same
oldest names every round instead of rotating). ``PENDING_ORDER``
risk-ranks the entries still awaiting their first driver check; the
rotation rule is mechanical, three tiers:

1. every pending entry (never driver-checked) first;
2. then green entries whose SOURCE FINGERPRINT has drifted since their
   last green row (``fingerprints.GREEN_FINGERPRINTS`` vs
   ``fingerprint.entry_fingerprint`` — the r8 verdict's defect: a
   rewrite must not ship on stale driver evidence), oldest-green
   first within the tier;
3. then unchanged green entries, oldest-green first (regression
   guard: the entry longest without a driver check re-verifies
   soonest).

After each round, ``tools/update_rotation.py CORRECTNESS_r{N}.json N
--write`` moves freshly green names out of ``PENDING_ORDER``, bumps
the last-green round of every green window row (re-checks included),
and re-records their fingerprints. Invariants are enforced by
build_driver_priority() and pinned in tests/test_inventory_contract.py.

Round-1/2 attributions were recovered from those rounds' verdict
texts (the JSON artifacts were overwritten); round-3 names come from
CORRECTNESS_r03.json directly.
"""

from __future__ import annotations

DRIVER_GREEN: dict[str, int] = {
    "reshape_pivot": 3,
    "json_extract_props": 3,
    "asof_join_clicks_purchases": 3,
    "range_join_value_bands": 3,
    "stream_interval_join_attribution": 3,
    "stream_tumbling_hourly": 3,
    "stream_sliding_2h": 3,
    "stream_session_windows": 3,
    "window_lag_lead": 8,
    "window_frame_moving_avg": 8,
    "events_funnel_conversion": 3,
    "events_cohort_retention": 3,
    "tpch_q12_priority_lines": 3,
    "agg_grouping_sets": 8,
    "window_value_functions": 3,
    "pack_sequences_chunked": 9,
    "sample_stratified": 2,
    "decontam_eval_overlap": 2,
    "text_repetition_stats": 3,
    "text_vocab_oov": 3,
    "text_gopher_rules": 3,
    "text_unigram_logprob": 3,
    "embedding_quantize_int8": 3,
    "embedding_kmeans_assign": 3,
    "embedding_kmeans_clusters": 3,
    "reshape_chunk_documents": 2,
    "join_salted_skew": 2,
    "pipeline_corpus_curation": 2,
    "tpch_q2_min_cost_supplier": 3,
    "tpch_q7_volume_shipping": 3,
    "tpch_q8_market_share": 3,
    "similarity_ann_lsh": 3,
    "similarity_ivf": 3,
    "window_qualify": 10,
    "asof_join_next_purchase": 3,
    "agg_approx_percentile": 3,
    "dialect_event_time": 10,
    "dialect_tpch_q1": 11,
    "dialect_tpch_q6": 11,
    "corpus_stats_by_stratum": 3,
    "dedup_span_boilerplate": 3,
    "events_sessionize": 3,
    "events_resample_locf": 11,
    "agg_mode_median": 3,
    "reshape_unpivot": 3,
    "text_edit_distance_pairs": 3,
    "sample_weighted": 3,
    "events_zscore_outliers": 3,
    "text_top_bigrams": 3,
    "sample_token_budget": 3,
    "flagship_filter_project": 11,
    "dialect_expression_projection": 11,
    "dialect_cte_scalar_in": 11,
    "window_running_sum": 11,
    "window_rank_family": 11,
    "udaf_group_median": 10,
    "dedup_minhash_lsh": 10,
    "dialect_predicates": 11,
    "expr_case_when": 8,
    "expr_string_functions": 8,
    "expr_date_functions": 8,
    "dialect_groupby_having": 11,
    "agg_global": 8,
    "agg_distinct": 11,
    "agg_count_distinct": 8,
    "agg_rollup": 8,
    "agg_cube": 8,
    "sort_topk": 8,
    "dialect_offset_limit": 11,
    "dialect_exists_theta": 11,
    "dialect_derived_table_q18": 11,
    "join_inner_rowlevel": 11,
    "join_broadcast_dims": 8,
    "join_semi": 8,
    "join_anti": 8,
    "join_left_outer": 8,
    "join_full_outer": 8,
    "join_cross_product": 8,
    "join_theta": 8,
    "window_rank_topn": 8,
    "expr_math_functions": 11,
    "setop_union": 8,
    "setop_intersect": 8,
    "window_range_frame": 8,
    "dedup_exact": 8,
    "dedup_exact_text": 8,
    "dedup_minhash_survivors": 10,
    "sample_hash_bucket": 8,
    "dedup_cluster_components": 10,
    "dedup_ngram_jaccard": 8,
    "dedup_simhash_candidates": 8,
    "dedup_embedding_cosine": 8,
    "dedup_embedding_lsh": 8,
    "similarity_topk_bruteforce": 8,
    "expr_array_functions": 2,
    "expr_regexp_extract": 2,
    "reshape_explode_tokens": 2,
    "pii_scrub": 2,
    "pack_sequences_greedy": 9,
    "dialect_udtf_ngrams": 11,
    "text_lang_confidence": 4,
    "similarity_ann_recall": 4,
    "search_rerank_cross_features": 4,
    "sample_mixture_alpha": 4,
    "search_eval_ndcg": 4,
    "events_cusum_changepoints": 9,
    "pack_batches_bucketed": 10,
    "text_keywords_rake": 4,
    "embedding_label_agreement": 4,
    "text_char_entropy": 4,
    "dialect_star_modifiers": 11,
    "dialect_try_cast": 11,
    "dialect_with_ties": 11,
    "dialect_ilike": 11,
    "dialect_setops": 11,
    "setop_intersect_all": 4,
    "dialect_tpch_q3": 11,
    "dialect_tpch_q12": 11,
    "dialect_rollup_grouping": 11,
    "dialect_grouping_sets": 11,
    "dialect_range_interval_frame": 10,
    "dialect_recursive_cte": 10,
    "dialect_self_join": 10,
    "dialect_agg_filter": 11,
    "dialect_string_agg": 11,
    "dialect_unnest": 11,
    "dialect_distinct_on": 11,
    "dialect_ansi_fetch_bool": 11,
    "dialect_broadcast_hint": 11,
    "dialect_select_star": 11,
    "dialect_group_by_all": 11,
    "dialect_json_arrow": 11,
    "window_ignore_nulls": 11,
    "embedding_pq_codes": 4,
    "similarity_pq_adc": 11,
    "similarity_pq_rerank": 11,
    "graph_pagerank_users": 9,
    "dedup_semantic_semdedup": 4,
    "text_bm25_search": 4,
    "search_hybrid_rrf": 4,
    "agg_hll_union_days": 4,
    "sketch_countmin_words": 4,
    "text_subword_segment": 4,
    "graph_triangle_count": 9,
    "graph_adamic_adar": 9,
    "similarity_mmr_rerank": 4,
    "dedup_incremental_new_docs": 4,
    "dedup_containment_ngram": 4,
    "dialect_udtf_sentences": 11,
    "dedup_max_shared_run": 5,
    "dialect_array_agg": 11,
    "multimodal_ppm_decode": 10,
    "multimodal_wav_decode": 5,
    "multimodal_video_frames": 10,
    "embedding_contrastive_pairs": 5,
    "text_quality_classifier": 5,
    "text_perplexity_bigram": 5,
    "reshape_global_ordinal": 10,
    "window_distinct_count": 5,
    "merge_upsert_orders": 5,
    "scd2_event_intervals": 5,
    "table_diff_cdc": 5,
    "stream_static_enrich": 5,
    "events_anomaly_mad": 5,
    "events_equidepth_quantiles": 9,
    "events_equidepth_approx": 5,
    "profile_table_columns": 5,
    "table_fingerprint": 5,
    "stats_correlation_matrix": 5,
    "events_value_histogram": 5,
    "events_rollup_cascade": 5,
    "events_resample_interpolate": 11,
    "events_user_rfm": 5,
    "events_ewma_smooth": 5,
    "events_trend_ols": 5,
    "events_markov_transitions": 5,
    "range_join_session_overlap": 5,
    "setop_except_all": 5,
    "tpch_q3_shipping_priority": 5,
    "agg_approx_count_distinct": 5,
    "setop_except": 5,
    "tpch_q1_pricing_summary": 5,
    "tpch_q5_local_supplier_volume": 5,
    "tpch_q6_forecast_revenue": 5,
    "tpch_q18_large_volume_customer": 5,
    "histogram_value_buckets": 5,
    "tpch_q4_order_priority": 5,
    "tpch_q10_returned_items": 5,
    "tpch_q14_promo_revenue": 5,
    "tpch_q9_product_profit": 5,
    "tpch_q11_important_stock": 5,
    "tpch_q13_customer_distribution": 5,
    "tpch_q15_top_supplier": 5,
    "tpch_q16_supplier_counting": 5,
    "tpch_q17_small_qty_revenue": 5,
    "tpch_q19_disjunctive_revenue": 5,
    "tpch_q20_promotion_suppliers": 5,
    "tpch_q21_single_return_supplier": 5,
    "tpch_q22_dormant_customers": 6,
    "text_token_stats": 6,
    "text_lang_id": 6,
    "text_quality_score": 6,
    "text_md5_fingerprint": 6,
    "text_winnow_fingerprint": 6,
    "text_tfidf_top_terms": 6,
    "multimodal_blob_meta": 6,
    "multimodal_features": 6,
    "multimodal_frame_sample": 6,
    "agg_statistical": 6,
    "agg_percentiles": 6,
    "search_hard_negatives": 6,
    "text_script_shares": 6,
    "corpus_ngram_novelty": 6,
    "shard_assign_bytes": 10,
    "embedding_dim_profile": 6,
    "events_seasonality_hourly": 6,
    "dedup_minhash_estimate_calibration": 6,
    "text_zipf_alpha": 6,
    "text_readability_fk": 6,
    "agg_weighted_median": 10,
    "agg_weighted_median_approx": 6,
    "stream_incremental_dedup": 6,
    "multimodal_dhash_neardup": 10,
    "text_hapax_ratio": 6,
    "text_source_vocab_jaccard": 6,
    "events_interarrival_profile": 10,
    "events_value_winsorize": 10,
    "graph_degree_distribution": 10,
    "table_partition_skew_report": 6,
    "similarity_knn_indegree": 6,
    "similarity_pair_margin": 6,
    "embedding_cosine_histogram": 6,
    "reshape_train_val_split": 6,
    "dedup_loss_by_source": 6,
    "stream_dedup_rate_by_batch": 6,
    "agg_gini_by_segment": 10,
    "sample_reservoir_per_key": 6,
    "reshape_user_sequences": 6,
    "stats_chi2_independence": 6,
    "events_hill_tail_index": 6,
    "agg_group_entropy": 6,
    "table_freshness_report": 6,
    "text_code_detect": 6,
    "dedup_prefix_cluster": 6,
    "text_vocab_coverage_curve": 6,
    "window_distribution_functions": 10,
    "graph_neighbor_jaccard": 10,
    "events_ab_welch_ztest": 6,
    "agg_gini_binned": 7,
    "window_distribution_binned": 7,
    "multimodal_audio_neardup": 7,
    "stats_ks_two_sample": 7,
    "events_psi_value_drift": 7,
    "join_bloom_prefilter": 7,
    "stats_bootstrap_poisson_ci": 7,
    "join_bloom_prefilter_partitioned": 7,
    "dedup_cross_modal_verdict": 10,
    "stream_psi_drift_by_batch": 7,
    "similarity_ivf_recall": 7,
    "decontam_bloom_prefilter": 10,
    "join_key_skew_advisor": 7,
    "stream_ks_drift_by_batch": 7,
    "similarity_pq_persisted_index": 10,
    "dedup_cross_modal_planted": 10,
    "stream_unified_drift_by_batch": 8,
    "similarity_pq_index_refresh": 11,
    "events_sessionize_by_type": 9,
    "sample_dsir_importance": 9,
    "stats_mannwhitney_u": 9,
    "text_bpe_learn_merges": 9,
    "graph_label_propagation": 11,
    "table_zorder_layout": 11,
    "events_ohlc_bars": 9,
    "text_kneser_ney_bigram": 9,
    "stats_bh_fdr": 9,
    "dialect_pivot": 11,
    "dialect_unpivot": 11,
    "dialect_values_table": 11,
    "stream_ohlc_hourly": 9,
    "similarity_ivfpq": 11,
    "stats_poisson_rate_test": 9,
    "dedup_keeper_by_quality": 10,
    "dialect_explain": 10,
    "dialect_qualify_pivot": 10,
    "dialect_unpivot_multi": 10,
    "reshape_fim_split": 10,
    "similarity_dim_truncation": 10,
    "similarity_ivfpq_residual": 10,
    "stream_pq_delta_encode": 10,
    "udaf_group_median_chunked": 10,
    "similarity_topk_batch": 11,
    "similarity_ivfpq_batch": 11,
}

# Never-driver-checked entries, highest risk first: dialect executors
# (parser->builder->compiler, the most moving parts), then replay-oracle
# and multi-stage operator entries, then warehouse maintenance, then
# the remainder in module order. New entries are inserted at the front
# of the block matching their risk class.
PENDING_ORDER: list[str] = [
    # round-12 additions
    "similarity_pq_batch",
    "reshape_leakage_safe_split",
    # round-5 additions — brand new surfaces, checked first
    # round-4 additions
    # round-5 late additions — placed BEHIND the already-rehearsed
    # 50-entry r5 window (slots 1-50 are frozen once rehearsed; these
    # rotate with the ≤12 leftovers in r6)
    # round-6 additions — placed BEHIND the 22 never-driver-checked
    # names (which fit the 50-slot window with room to spare)
    # round-6 curation_ext batch — fills the window to exactly 50
    # pending (37 + 13); ordered behind everything above so the r5
    # backlog is still verified first
    # round-10 additions — the queue was empty after the r9 promotion;
    # these front the r10 window, ahead of the changed-tier re-checks
    # round-6 late additions — behind the rehearsed 50-entry r6 window;
    # these front the r7 window
    # round-7 additions — added BEFORE the r7 window rehearsal (the
    # r6 rule: nothing enters the inventory after rehearsal), placed
    # behind the r6 backlog so those seven verify first
    # round-8 additions — the r7 window closed the contract (262/262
    # green), so these front the r8 window; oldest-green re-checks
    # fill the remaining slots
    # round-9 additions — pending always precedes the changed-since-
    # green tier (the 13 r8 rewrites), which precedes oldest-green
    # round-9 second-session additions
    # round-11 additions — front the r11 window ahead of the
    # changed-since-green backlog
]


def build_driver_priority(
    inventory_names: list[str],
    changed: frozenset[str] | set[str] = frozenset(),
) -> list[str]:
    """Full emission order: all pending entries (risk-ranked), then
    green entries in ``changed`` (source fingerprint drifted since
    their last green row — their driver evidence is stale), then the
    unchanged greens; both green tiers OLDEST-LAST-GREEN-FIRST (by the
    round their most recent green row landed, inventory order within a
    round). With the contract closed (262/262 in r7), the window's
    re-check slots guard against REGRESSION — and a rewritten entry is
    strictly more exposed than an old unchanged one, hence the tier.
    Raises if the bookkeeping has drifted: duplicate names, names
    missing from the inventory, or an entry listed as both pending and
    green (a green entry hogging a window slot)."""
    inv = set(inventory_names)
    if len(set(PENDING_ORDER)) != len(PENDING_ORDER):
        dupes = [n for i, n in enumerate(PENDING_ORDER) if n in PENDING_ORDER[:i]]
        raise RuntimeError(f"duplicate names in PENDING_ORDER: {dupes}")
    overlap = set(PENDING_ORDER) & set(DRIVER_GREEN)
    if overlap:
        raise RuntimeError(f"entries both pending and green: {sorted(overlap)}")
    missing = [n for n in (*PENDING_ORDER, *DRIVER_GREEN) if n not in inv]
    if missing:
        raise RuntimeError(f"rotation names not in inventory: {missing}")
    unlisted = [n for n in inventory_names
                if n not in DRIVER_GREEN and n not in set(PENDING_ORDER)]
    if unlisted:
        raise RuntimeError(
            f"entries missing from rotation bookkeeping (add to PENDING_ORDER): {unlisted}"
        )
    pos = {n: i for i, n in enumerate(inventory_names)}
    greens = sorted(
        (n for n in inventory_names if n in DRIVER_GREEN),
        key=lambda n: (n not in changed, DRIVER_GREEN[n], pos[n]),
    )
    return list(PENDING_ORDER) + greens
