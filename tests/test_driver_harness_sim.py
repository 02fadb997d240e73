"""Driver-harness simulation: the driver runs ``__spark_entry__`` under
ITS OWN SparkSession, not ours — entries must not depend on
``warpdb_spark.session.get_spark`` defaults (static confs like Kryo/AQE
can't be assumed; runtime-settable ones such as the events table's
nanosAsLong + UTC pinning must be applied by the entries themselves).

Runs in a subprocess because a same-JVM getOrCreate would silently
reuse our configured session.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("plain-driver").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry

sf = "/root/testdata/sf0.001"
assert entry.entry(spark).count() >= 0

qs = entry.queries()
# representative subset: events (ns-timestamps), dialect, join-heavy,
# window, text/dedup pipeline, subquery machinery
subset = [
    "stream_tumbling_hourly",
    "stream_interval_join_attribution",
    "dialect_cte_scalar_in",
    "dialect_derived_table_q18",
    "tpch_q5_local_supplier_volume",
    "window_rank_family",
    "text_token_stats",
    "dedup_exact_text",
    "sample_hash_bucket",
    # entries changed in r2 (new oracles / output shapes)
    "text_winnow_fingerprint",
    "dedup_simhash_candidates",
    "dedup_embedding_lsh",
    "dedup_ngram_jaccard",
    "multimodal_features",
    "similarity_topk_bruteforce",
    "expr_math_functions",
    "agg_approx_count_distinct",
]
for name in subset:
    n = qs[name](spark, sf).count()
    assert n >= 0, name
print("PLAIN_SESSION_OK", len(subset))
"""


def test_entries_run_under_plain_session():
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PLAIN_SESSION_OK" in out.stdout
