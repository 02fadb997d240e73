"""Honest re-measurement of the round-5 scale replay numbers.

Round 6 found that `.count()`-based replay timing lets Catalyst prune
aggregate expressions wholesale (see PLANS.md "honest replay
materialization"); the round-5 replays used throwaway count()-style
scripts, so the PLANS.md numbers for aggregate-shaped entries may
understate real work. This tool rebuilds the corpora from the shared
builders (tools/replay_corpus.py — 1M docs / 20M events / 1M×64-dim
embeddings, parquet round-trip) and re-times the round-5-cited
entries with FULL materialization (replay_corpus.force).

Note: the published r6 numbers in PLANS.md were measured before this
file switched to the shared event builder (its value column used
exponent 2.0·×500 rather than the shared 3.0·×560) — same shape and
scale, so the comparisons hold, but re-runs will differ in decimals.

Usage: PYTHONPATH=/root/repo python tools/replay_scale_honest.py
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warpdb_spark.session import get_spark

from tools import replay_corpus as rc

OUT = "/tmp/replay_r6_honest_corpus"


def main():
    spark = get_spark("replay-honest")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    os.makedirs(OUT, exist_ok=True)
    rc.build_documents(spark, OUT)
    rc.build_events(spark, OUT)
    rc.build_embeddings(spark, OUT)
    print(f"corpus build: {time.time()-t0:.1f}s")

    import warpdb_spark.inventory.pipeline_ops as po
    import warpdb_spark.inventory.scale_ops as so

    entries = [
        ("embedding_dim_profile", po.embedding_dim_profile),
        ("text_script_shares", po.text_script_shares),
        ("events_seasonality_hourly", so.events_seasonality_hourly),
        ("events_trend_ols", so.events_trend_ols),
        ("corpus_ngram_novelty", so.corpus_ngram_novelty),
        ("shard_assign_bytes", so.shard_assign_bytes),
        ("text_zipf_alpha", so.text_zipf_alpha),
        ("agg_weighted_median", so.agg_weighted_median),
    ]
    for name, fn in entries:
        t0 = time.time()
        n = rc.force(fn(spark, OUT))
        print(f"{name}: {n} rows in {time.time()-t0:.1f}s")

    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
