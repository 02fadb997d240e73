"""Honest re-measurement of the round-5 scale replay numbers.

Round 6 found that `.count()`-based replay timing lets Catalyst prune
aggregate expressions wholesale (see PLANS.md "honest replay
materialization"); the round-5 replays used throwaway count()-style
scripts, so the PLANS.md numbers for aggregate-shaped entries may
understate real work. This tool rebuilds equivalent synthetic corpora
(1M docs / 20M events / 1M×64-dim embeddings, parquet round-trip) and
re-times the round-5-cited entries with FULL materialization
(xxhash64 every column, bit_xor reduce).

Usage: PYTHONPATH=/root/repo python tools/replay_scale_honest.py
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warpdb_spark.session import get_spark

OUT = "/tmp/replay_r6_honest_corpus"


def build(spark):
    os.makedirs(OUT, exist_ok=True)
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
                  + 1e-6, 2.0) * 500 + 1, 2
        ).alias("value"),
    )
    events.write.mode("overwrite").parquet(f"{OUT}/events.parquet")

    # 1M vectors x 64 dims = 64M values (the r5-cited dim-profile scale)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    emb = spark.range(1_000_000).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        F.pmod(F.col("id"), F.lit(8)).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")


def main():
    spark = get_spark("replay-honest")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build(spark)
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
        df = fn(spark, OUT)
        h = df.select(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("h")
        )
        n = h.agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h")).collect()[0]["n"]
        print(f"{name}: {n} rows in {time.time()-t0:.1f}s")

    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
