"""Scale replays for the round-6 curation_ext entries.

Generates synthetic corpora ON-CLUSTER (spark.range → column
expressions, no driver loops), parquet round-trips them so scans are
realistic, then times each new entry end-to-end at 1M docs / 20M rows.
Usage: PYTHONPATH=/root/repo python tools/replay_curation_r6.py
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warpdb_spark.session import get_spark

OUT = "/tmp/replay_r6"


def build(spark):
    os.makedirs(OUT, exist_ok=True)
    # --- documents: 1M docs, ~40 words each from a hashed vocab -----------
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id") * 41 + i), F.lit(30000)).cast("string"),
        ),
    )
    docs = (
        spark.range(1_000_000)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
            F.concat(F.lit("l"), F.pmod(F.col("id"), F.lit(5)).cast("string")).alias(
                "lang"
            ),
            F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(20)).cast("string")).alias(
                "source"
            ),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    # --- orders: 20M rows, heavy-ish value spread -------------------------
    orders = spark.range(20_000_000).select(
        F.col("id").alias("o_orderkey"),
        F.element_at(
            F.array(*[F.lit(p) for p in ("1-URGENT", "2-HIGH", "3-MEDIUM",
                                         "4-NOT SPECIFIED", "5-LOW")]),
            (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"),
        ).alias("o_orderpriority"),
        (
            F.round(
                F.pow(F.pmod(F.xxhash64("id"), F.lit(100000)) / 100000.0 + 1e-6, 2.0)
                * 499000
                + 1000,
                2,
            )
        ).alias("o_totalprice"),
    )
    orders.write.mode("overwrite").parquet(f"{OUT}/orders.parquet")

    # --- events: 20M rows, 200k users, int64-ns ts (testdata layout) ------
    base_ns = 1_700_000_000_000_000_000
    events = spark.range(20_000_000).select(
        F.col("id").alias("event_id"),
        (F.lit(base_ns) + F.col("id") * 1_000_000_000).alias("ts"),
        F.pmod(F.xxhash64(F.col("id") * 7), F.lit(200_000)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup",
                                         "error")]),
            (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        F.round(
            F.pow(F.pmod(F.xxhash64(F.col("id") * 13), F.lit(100000)) / 100000.0
                  + 1e-6, 3.0) * 560,
            2,
        ).alias("value"),
        F.lit("{}").alias("props"),
    )
    events.write.mode("overwrite").parquet(f"{OUT}/events.parquet")


def main():
    spark = get_spark("replay-r6")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build(spark)
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
    ]
    for name, fn in entries:
        t0 = time.time()
        df = fn(spark, OUT)
        # Force FULL materialization: .count() lets Spark prune every
        # column the count doesn't need (it erased the gini moment
        # sums entirely and hid an int64 overflow), so hash every
        # column and bit_xor the hashes (bit_xor cannot overflow,
        # unlike summing full-range longs).
        h = df.select(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("h")
        )
        n = h.agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h")).collect()[0]["n"]
        print(f"{name}: {n} rows in {time.time()-t0:.1f}s")

    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
