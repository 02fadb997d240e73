"""Driver-facing query inventory.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (ANSI SQL for DuckDB).
``__spark_entry__.py`` aggregates them. Naming convention: the prefix
states the SURVEY §2 operator family the entry covers.

Entry ORDER matters: the driver's per-round correctness gate verifies a
bounded window from the front of the ``queries()`` dict (r1 checked
exactly the first 50 entries). ``DRIVER_PRIORITY`` therefore lists the
entries that most need fresh driver verification this round — the 45
entries outside r1's window (all pipeline ops + TPC-H q9/q11–q22) plus
the two entries fixed after r1 (``expr_math_functions``,
``agg_approx_count_distinct``). Entries already driver-green in r1 come
after; they remain guarded by the local oracle gate and pytest.
"""

from __future__ import annotations

# Front-of-dict entries for the driver's bounded correctness window.
# Names listed here are emitted first (in this order); anything not
# listed follows in module order. A name that no longer exists is an
# error — the list must track the inventory.
DRIVER_PRIORITY: list[str] = [
    # pipeline ops — never driver-verified in r1
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "text_md5_fingerprint",
    "text_winnow_fingerprint",
    "text_tfidf_top_terms",
    "dedup_exact",
    "dedup_exact_text",
    "dedup_minhash_lsh",
    "dedup_minhash_survivors",
    "sample_hash_bucket",
    "dedup_cluster_components",
    "dedup_simhash_candidates",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    "similarity_ivf",
    "multimodal_blob_meta",
    "multimodal_features",
    "multimodal_frame_sample",
    "agg_statistical",
    "agg_percentiles",
    "expr_array_functions",
    "expr_regexp_extract",
    "reshape_pivot",
    "reshape_explode_tokens",
    "json_extract_props",
    "asof_join_clicks_purchases",
    "range_join_value_bands",
    "stream_interval_join_attribution",
    "stream_tumbling_hourly",
    "stream_sliding_2h",
    "stream_session_windows",
    # TPC-H entries outside r1's window
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_lines",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counting",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_single_return_supplier",
    "tpch_q22_dormant_customers",
    # fixed after r1 (hash fail / no_oracle) — need fresh driver rows
    "expr_math_functions",
    "agg_approx_count_distinct",
    # new in r2 — pii_scrub (regex-dialect risk) and the greedy packer
    # (applyInPandas vs recursive-CTE risk) take the window's last two
    # slots; the other new curation entries are guarded by the local
    # oracle until r3 rotation.
    "dedup_ngram_jaccard",
    "pii_scrub",
    "pack_sequences_greedy",
]


def load_all():
    from warpdb_spark.inventory import core_sql, pipeline_ops, tpch_extra

    merged_q: dict = {}
    merged_o: dict = {}
    for m in (core_sql, tpch_extra, pipeline_ops):
        merged_q.update(m.QUERIES)
        merged_o.update(m.ORACLES)

    missing = [n for n in DRIVER_PRIORITY if n not in merged_q]
    if missing:
        raise RuntimeError(f"DRIVER_PRIORITY names not in inventory: {missing}")

    queries: dict = {n: merged_q[n] for n in DRIVER_PRIORITY}
    queries.update((n, q) for n, q in merged_q.items() if n not in queries)
    oracles: dict = {n: merged_o[n] for n in queries if n in merged_o}
    return queries, oracles
