"""Capability-overlap detection over the inventory's oracle SQL.

The r10 incident: two late additions (``text_pii_scrub``,
``sample_mixture_temperature``) duplicated EXISTING capabilities under
new names and shipped before a manual review caught them. The lesson
("grep the capability, not the name") is mechanized here two ways:

1. **Pinned twins** — IDF-weighted token similarity >= ``TWIN_THRESH``
   is the strong-signal tier: at that level two oracles share most of
   their *distinctive* vocabulary (table/column/function names that are
   rare across the inventory). Every such pair must be a REVIEWED,
   named entry in ``ALLOWED_TWINS`` (intentional dialect-vs-API
   spellings, scale twins, persisted-index family members); the
   contract test pins equality both ways so stale pins are pruned.

2. **Nearest-neighbor report** — semantic duplicates routinely score
   BELOW any safe auto-fail threshold (the r10 pairs measured 0.16 and
   0.21 — under the noise ceiling of legitimate family resemblance),
   but in both incidents the true duplicate ranked in the new entry's
   TOP-2 nearest neighbors. ``tools/check_overlap.py`` prints the
   top-k for every new entry; the round rhythm requires reading that
   report before an entry ships. The contract test replays the r10
   incident SQL and pins that both duplicates rank in the top 3 — the
   detector that would have caught them stays calibrated.

Why IDF weighting: plain token Jaccard rates the incident pairs 0.25
while scoring scaffolding-heavy unrelated entries higher — shared
SELECT/GROUP BY vocabulary is noise. Down-weighting tokens by
inventory-wide document frequency makes rare capability words (regex
literals, placeholder names, weight-law functions) carry the score.
"""

from __future__ import annotations

import math
import re

# SQL scaffolding that carries no capability signal.
_STOP = frozenset(
    """select from where group by order as cast with on join and or not in is
    null using over partition rows between unbounded preceding following
    current row case when then else end distinct union all left right inner
    outer cross limit offset having asc desc int bigint double varchar
    boolean float true false coalesce count sum min max avg round
    row_number rank lit""".split()
)

#: Strong-signal tier: pairs at or above this share most distinctive
#: vocabulary and must be reviewed into ALLOWED_TWINS.
TWIN_THRESH = 0.5

#: Reviewed intentional twins (sorted-name pairs). Dialect-vs-API
#: spellings of the same oracle, scale twins (same semantics, chunked
#: plan), and families sharing one index/scoring scaffold. A NEW pair
#: at >= TWIN_THRESH fails the contract test until reviewed here.
ALLOWED_TWINS: frozenset[tuple[str, str]] = frozenset(
    tuple(sorted(p))
    for p in [
        # same oracle, dialect vs DataFrame-API spelling
        ("dialect_tpch_q1", "tpch_q1_pricing_summary"),
        ("dialect_tpch_q3", "tpch_q3_shipping_priority"),
        ("dialect_tpch_q6", "tpch_q6_forecast_revenue"),
        ("dialect_tpch_q12", "tpch_q12_priority_lines"),
        ("dialect_derived_table_q18", "tpch_q18_large_volume_customer"),
        ("dialect_unpivot", "reshape_unpivot"),
        ("dialect_rollup_grouping", "agg_rollup"),
        ("dialect_pivot", "dialect_qualify_pivot"),
        # scale twins: same output + oracle, chunked/partitioned plan
        ("udaf_group_median", "udaf_group_median_chunked"),
        ("join_bloom_prefilter", "join_bloom_prefilter_partitioned"),
        # one fixture, complementary verdicts
        ("join_anti", "join_semi"),
        ("setop_intersect", "setop_union"),
        ("dedup_cross_modal_planted", "dedup_cross_modal_verdict"),
        ("asof_join_clicks_purchases", "asof_join_next_purchase"),
        ("stream_sliding_2h", "stream_tumbling_hourly"),
        ("events_ohlc_bars", "stream_ohlc_hourly"),
        ("events_sessionize", "events_sessionize_by_type"),
        ("multimodal_ppm_decode", "multimodal_video_frames"),
        ("agg_approx_percentile", "agg_percentiles"),
        ("text_lang_confidence", "text_lang_id"),
        # the LSH dedup family shares the shingle/band scaffold
        ("dedup_minhash_lsh", "dedup_minhash_survivors"),
        ("dedup_cluster_components", "dedup_minhash_lsh"),
        ("dedup_cluster_components", "dedup_minhash_survivors"),
        ("dedup_cluster_components", "dedup_keeper_by_quality"),
        # r12 leakage-safe split: shares the LSH→Jaccard→components
        # scaffold (and its recursive-CTE oracle prefix) with the
        # cluster/keeper entries but implements a DISTINCT policy
        # layer — split assignment hashed on the cluster key so
        # near-dups never straddle train/val, plus the moved-doc
        # leakage report (reviewed at entry creation)
        ("dedup_cluster_components", "reshape_leakage_safe_split"),
        ("dedup_keeper_by_quality", "reshape_leakage_safe_split"),
        ("dedup_embedding_cosine", "dedup_embedding_lsh"),
        ("dedup_exact", "sample_hash_bucket"),
        ("dedup_exact", "sample_stratified"),
        ("sample_hash_bucket", "sample_stratified"),
        ("stream_dedup_rate_by_batch", "stream_incremental_dedup"),
        # the PQ family shares codebook-train/encode/ADC scaffolding
        ("similarity_pq_adc", "similarity_pq_persisted_index"),
        ("similarity_pq_adc", "similarity_pq_index_refresh"),
        ("similarity_pq_adc", "similarity_pq_rerank"),
        ("similarity_pq_adc", "stream_pq_delta_encode"),
        ("similarity_pq_index_refresh", "similarity_pq_persisted_index"),
        ("similarity_pq_index_refresh", "similarity_pq_rerank"),
        ("similarity_pq_index_refresh", "stream_pq_delta_encode"),
        ("similarity_pq_persisted_index", "similarity_pq_rerank"),
        ("similarity_pq_persisted_index", "stream_pq_delta_encode"),
        ("similarity_pq_rerank", "stream_pq_delta_encode"),
        ("similarity_ivfpq", "similarity_ivfpq_residual"),
        ("similarity_ivfpq", "similarity_pq_adc"),
        ("similarity_ivfpq", "similarity_pq_persisted_index"),
        ("similarity_ivfpq", "similarity_pq_index_refresh"),
        ("similarity_ivfpq", "similarity_pq_rerank"),
        ("similarity_ivfpq_residual", "similarity_pq_rerank"),
        # r11 distributed-query twin: same end-to-end IVFADC oracle
        # (query filter widened), distinct capability (no driver
        # collect of query vectors — reviewed at entry creation)
        ("similarity_ivfpq_batch", "similarity_ivfpq_residual"),
        ("similarity_ivfpq", "similarity_ivfpq_batch"),
        ("similarity_ivfpq_batch", "similarity_pq_rerank"),
        # r12 distributed-query twin of the plain-PQ family: same
        # codebook→codes→ADC oracle (qlut filter widened), distinct
        # capability (blocked cogroup, LUT built in-group, no driver
        # collect of query vectors — pq_topk's cap delegates here;
        # reviewed at entry creation)
        ("similarity_pq_adc", "similarity_pq_batch"),
        ("similarity_pq_batch", "similarity_pq_persisted_index"),
        ("similarity_pq_batch", "similarity_pq_index_refresh"),
        ("similarity_pq_batch", "similarity_pq_rerank"),
        ("similarity_pq_batch", "stream_pq_delta_encode"),
        ("similarity_ivfpq", "similarity_pq_batch"),
        ("similarity_knn_indegree", "similarity_topk_bruteforce"),
        # retrieval-eval family shares the BM25 + ranking scaffold
        ("search_hard_negatives", "search_hybrid_rrf"),
        ("search_hard_negatives", "text_bm25_search"),
        ("search_hybrid_rrf", "search_rerank_cross_features"),
        ("search_hybrid_rrf", "text_bm25_search"),
        ("search_eval_ndcg", "search_hybrid_rrf"),
        # drift monitors share the batch framing
        ("stream_ks_drift_by_batch", "stream_unified_drift_by_batch"),
        ("stream_psi_drift_by_batch", "stream_unified_drift_by_batch"),
        # curation pipeline reuses the quality-score features
        ("pipeline_corpus_curation", "text_quality_score"),
        ("corpus_stats_by_stratum", "text_quality_score"),
        ("corpus_stats_by_stratum", "pipeline_corpus_curation"),
    ]
)


def tokens(sql: str) -> frozenset[str]:
    """Distinctive-token set of an oracle SQL string: identifiers and
    numeric literals, lowercased, SQL scaffolding removed."""
    ts = re.findall(r"[a-z_][a-z_0-9]*|\d+\.\d+|\d+", sql.lower())
    return frozenset(t for t in ts if t not in _STOP and len(t) > 1)


class OverlapIndex:
    """IDF-weighted similarity over a name -> oracle-SQL mapping."""

    def __init__(self, oracles: dict[str, str]):
        self.toks = {n: tokens(s) for n, s in oracles.items()}
        self.n = max(1, len(self.toks))
        df: dict[str, int] = {}
        for ts in self.toks.values():
            for t in ts:
                df[t] = df.get(t, 0) + 1
        self._df = df

    def _w(self, t: str) -> float:
        return math.log(self.n / self._df.get(t, 1))

    def sim_tokens(self, a: frozenset[str], b: frozenset[str]) -> float:
        union = sum(self._w(t) for t in a | b)
        return sum(self._w(t) for t in a & b) / union if union else 0.0

    def sim(self, a: str, b: str) -> float:
        return self.sim_tokens(self.toks[a], self.toks[b])

    def nearest(self, sql_or_name: str, k: int = 5) -> list[tuple[float, str]]:
        """Top-k nearest inventory entries for an oracle SQL string (or
        an entry name, which is excluded from its own ranking)."""
        if sql_or_name in self.toks:
            probe, skip = self.toks[sql_or_name], sql_or_name
        else:
            probe, skip = tokens(sql_or_name), None
        scored = sorted(
            (
                (round(self.sim_tokens(probe, ts), 3), n)
                for n, ts in self.toks.items()
                if n != skip
            ),
            reverse=True,
        )
        return scored[:k]

    def twin_pairs(self) -> list[tuple[float, str, str]]:
        """Every pair at or above TWIN_THRESH, strongest first."""
        names = sorted(self.toks)
        out = []
        for i, a in enumerate(names):
            for b in names[i + 1 :]:
                s = self.sim(a, b)
                if s >= TWIN_THRESH:
                    out.append((round(s, 3), a, b))
        out.sort(reverse=True)
        return out
