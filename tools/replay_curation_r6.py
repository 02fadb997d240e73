"""Scale replays for the round-6 curation_ext entries.

Generates synthetic corpora ON-CLUSTER (shared builders in
tools/replay_corpus.py — spark.range → column expressions, no driver
loops), parquet round-trips them so scans are realistic, then times
each new entry end-to-end at 1M docs / 20M rows with FULL
materialization (see replay_corpus.force — .count() is not a replay).
Usage: PYTHONPATH=/root/repo python tools/replay_curation_r6.py
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warpdb_spark.session import get_spark

from tools import replay_corpus as rc

OUT = "/tmp/replay_r6"


def main():
    only = set(sys.argv[1:])  # optional entry-name filter
    spark = get_spark("replay-r6")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    os.makedirs(OUT, exist_ok=True)
    rc.build_documents(spark, OUT)
    rc.build_orders(spark, OUT)
    rc.build_events(spark, OUT)
    print(f"corpus build: {time.time()-t0:.1f}s")

    import warpdb_spark.inventory.curation_ext as cx

    # Replay the wedge join in its cap-binding configuration (the
    # uncapped 1M run on this uniformly-dense synthetic graph is the
    # documented 951s quadratic blowup; see PLANS.md round 6).
    cx._JACCARD_CENTER_CAP = 64

    entries = [
        ("agg_gini_by_segment", cx.agg_gini_by_segment),
        ("agg_gini_binned", cx.agg_gini_binned),
        ("window_distribution_functions", cx.window_distribution_functions),
        ("window_distribution_binned", cx.window_distribution_binned),
        ("sample_reservoir_per_key", cx.sample_reservoir_per_key),
        ("reshape_user_sequences", cx.reshape_user_sequences),
        ("stats_chi2_independence", cx.stats_chi2_independence),
        ("events_hill_tail_index", cx.events_hill_tail_index),
        ("agg_group_entropy", cx.agg_group_entropy),
        ("table_freshness_report", cx.table_freshness_report),
        ("events_ab_welch_ztest", cx.events_ab_welch_ztest),
        ("text_code_detect", cx.text_code_detect),
        ("dedup_prefix_cluster", cx.dedup_prefix_cluster),
        ("text_vocab_coverage_curve", cx.text_vocab_coverage_curve),
        ("graph_neighbor_jaccard", cx.graph_neighbor_jaccard),
        ("stats_ks_two_sample", cx.stats_ks_two_sample),
        ("events_psi_value_drift", cx.events_psi_value_drift),
        ("stats_bootstrap_poisson_ci", cx.stats_bootstrap_poisson_ci),
    ]
    for name, fn in entries:
        if only and name not in only:
            continue
        t0 = time.time()
        n = rc.force(fn(spark, OUT))
        print(f"{name}: {n} rows in {time.time()-t0:.1f}s")

    if not only or "join_bloom_prefilter" in only:
        # bloom sizing A/B: the fact side is 20M lines over 2M order
        # keys (400k urgent build keys). The entry's fixed 64 Kbit
        # bitmap saturates at that key count (kn/m = 18 -> FPR ~ 1:
        # the prefilter passes everything, the exact join still makes
        # the result right — measured, not assumed). Resizing to
        # m = 2^24 (16 bits/key, the production rule) restores the
        # reduction; the words table is m/30 ~ 559k rows, still a
        # broadcast.
        rc.build_lineitem(spark, OUT, n_lines=20_000_000, n_orders=2_000_000)
        rc.build_orders(spark, OUT, n_orders=2_000_000)
        for bits, tag in ((1 << 16, "64Kbit (entry default, saturated)"),
                          (1 << 24, "16Mbit (16 bits/key)")):
            cx._BLOOM_BITS = bits
            t0 = time.time()
            df = cx.join_bloom_prefilter(spark, OUT)
            rc.force(df)
            dt = time.time() - t0
            from pyspark.sql import functions as F
            tot = df.agg(
                F.sum("n_bloom_pass").alias("p"), F.sum("n_matched").alias("m")
            ).collect()[0]
            print(
                f"join_bloom_prefilter {tag}: pass={tot['p']} "
                f"matched={tot['m']} in {dt:.1f}s"
            )
        cx._BLOOM_BITS = 1 << 16

    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
