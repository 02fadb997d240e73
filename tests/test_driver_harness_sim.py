"""Driver-harness simulation: the driver runs ``__spark_entry__`` under
ITS OWN SparkSession, not ours — entries must not depend on
``warpdb_spark.session.get_spark`` defaults (static confs like Kryo/AQE
can't be assumed; runtime-settable ones such as the events table's UTC
pinning must be applied by the entries themselves).

Runs in a subprocess because a same-JVM getOrCreate would silently
reuse our configured session.

Also asserts the /root/testdata schemas the entries assume — if the
driver regenerates the parquet with a different event-time encoding
(it switched ns-longs → timestamp[us] between rounds 1 and 2), this
fails loudly at round start instead of inside the driver's run.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_testdata_schema_assumptions():
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        ev = pq.read_schema(f"{d}/events.parquet")
        ts = ev.field("ts").type
        # every encoding ns_to_timestamp adapts to; anything else is a
        # NEW drift that needs a reader branch
        assert str(ts) in ("int64", "timestamp[ns]", "timestamp[us]", "timestamp[ms]", "timestamp[s]",
                           "timestamp[us, tz=UTC]", "timestamp[ns, tz=UTC]"), (sf, ts)
        emb = pq.read_schema(f"{d}/embeddings.parquet")
        assert "list" in str(emb.field("embedding").type), (sf, emb)


# Arrow schema snapshot of EVERY testdata table as of round 4. The ts
# column is exempted above (the schema-adaptive reader handles its known
# encodings); everything else must match exactly — the round-2 incident
# showed testdata encodings can drift between rounds, and this makes any
# drift fail in minute one of the round instead of inside the driver run.
_TABLE_SCHEMAS = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "<time>",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "<time>",
    },
    "events": {
        "event_id": "int64",
        "ts": "<time>",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}

# encodings the schema-adaptive readers handle for time-like columns
_TIME_OK = {
    "int64", "timestamp[ns]", "timestamp[us]", "timestamp[ms]", "timestamp[s]",
    "timestamp[us, tz=UTC]", "timestamp[ns, tz=UTC]", "date32[day]",
}


def test_all_table_schemas_pinned():
    """Round-start canary: every table, every column, every sf."""
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        for table, expected in _TABLE_SCHEMAS.items():
            schema = pq.read_schema(f"{d}/{table}.parquet")
            got = {f.name: str(f.type) for f in schema}
            assert set(got) == set(expected), (sf, table, sorted(got), sorted(expected))
            for col, want in expected.items():
                if want == "<time>":
                    assert got[col] in _TIME_OK, (sf, table, col, got[col])
                else:
                    assert got[col] == want, (sf, table, col, got[col], want)


# Entries whose Spark side touches the events table (event-time ops):
# ALL of them run under the plain session — this exact set regressed in
# round 2 when the testdata's ts encoding changed.
_EVENTS_ENTRIES = [
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
]

_SCRIPT = """
import sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("plain-driver").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry

sf = "/root/testdata/sf0.001"
assert entry.entry(spark).count() >= 0

qs = entry.queries()

# EVERY events-touching entry, discovered dynamically: any query whose
# source reads the events table must work in a plain default session.
import inspect
events_entries = sorted(
    name for name, fn in qs.items()
    if '"events"' in inspect.getsource(fn) or "'events'" in inspect.getsource(fn)
)
expected = set({_EVENTS_ENTRIES!r})
missing = expected - set(events_entries)
assert not missing, f"events entries vanished from queries(): {{missing}}"

# representative non-events subset: dialect, join-heavy, window,
# text/dedup pipeline, subquery machinery
subset = events_entries + [
    "dialect_cte_scalar_in",
    "dialect_derived_table_q18",
    "tpch_q5_local_supplier_volume",
    "window_rank_family",
    "window_qualify",
    "text_token_stats",
    "dedup_exact_text",
    "sample_hash_bucket",
    "text_winnow_fingerprint",
    "dedup_simhash_candidates",
    "dedup_embedding_lsh",
    "dedup_ngram_jaccard",
    "multimodal_features",
    "similarity_topk_bruteforce",
    "expr_math_functions",
    "agg_approx_count_distinct",
    "text_subword_segment",
    "similarity_mmr_rerank",
    "sketch_countmin_words",
    "reshape_global_ordinal",
    "dialect_distinct_on",
    # round-4 additions — the UDTF entry registers a Spark UDTF and a
    # temp view on whatever session the driver provides
    "dialect_udtf_ngrams",
    "search_rerank_cross_features",
    "similarity_ann_recall",
    "text_lang_confidence",
    # round-6 late additions — binned scale paths + the audio
    # mapInPandas entry (exercises Arrow batches on a plain session)
    "agg_gini_binned",
    "window_distribution_binned",
    "multimodal_audio_neardup",
    "stats_ks_two_sample",
    "events_psi_value_drift",
    "join_bloom_prefilter",
    "stats_bootstrap_poisson_ci",
    # r12 (r11 verdict item 5): the heaviest batch-ANN entries — both
    # cogroup both sides of a corpus-scale query set, the exact shape
    # most sensitive to plain-session defaults (Arrow batch size,
    # shuffle partitions)
    "similarity_topk_batch",
    "similarity_ivfpq_batch",
    "similarity_pq_batch",
    # r12 pending addition: the leakage-safe split (LSH + components
    # + md5 split math on a plain session)
    "reshape_leakage_safe_split",
]
for name in subset:
    n = qs[name](spark, sf).count()
    assert n >= 0, name
    spark.catalog.clearCache()  # drop entry-local persist() caches
print("PLAIN_SESSION_OK", len(subset))
"""


@pytest.mark.slow
def test_entries_run_under_plain_session():
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(_EVENTS_ENTRIES=_EVENTS_ENTRIES)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PLAIN_SESSION_OK" in out.stdout
