"""Continuously-updated sketch rollups: a standing per-day HLL sketch
table maintained from a stream — the streaming counterpart of
``inventory/retrieval_ops.py::agg_hll_union_days`` (superset; the
reference has no streaming or sketch facilities).

The store holds one row per day: ``(day, sketch, n_rows)``. Each
micro-batch sketches its own rows per day (map-side partial
aggregation — only sketch states shuffle), then merges into the store
with ``hll_union`` on matching days. Because HLL union is commutative,
associative, and idempotent-in-distribution, the merged table answers
any date-range distinct count by unioning kilobyte states — raw events
are never rescanned.

Exactly-once: the store write goes through a staging directory swap
(read-modify-write of a tiny table; the batch's day-partitions are
rebuilt from scratch each time), and a replayed batch re-merges into
the PRE-batch store snapshot only if the caller keeps per-batch
snapshots — for at-least-once sources the practical contract is
"estimates converge": re-merging the same rows into an HLL sketch
cannot push the estimate further from the truth than one merge did
(set semantics absorb duplicates), which is exactly why sketch stores
tolerate replay where exact counters cannot.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, functions as F


def batch_day_sketches(
    batch_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """(day, sketch, n_rows) for one batch — partial-aggregated, only
    sketch states cross the shuffle."""
    return batch_df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_into_store(
    batch_sketches: DataFrame,
    store_path: str,
) -> None:
    """Merge per-day batch sketches into the standing store: matching
    days union sketches and add row counts; new days insert. The store
    is tiny (one row per day), so the full-outer merge is a broadcast
    job; the swap is atomic-by-rename."""
    spark = batch_sketches.sparkSession
    b = batch_sketches.select(
        F.col("day").alias("b_day"),
        F.col("sketch").alias("b_sketch"),
        F.col("n_rows").alias("b_n"),
    )
    if os.path.isdir(store_path) and os.listdir(store_path):
        s = spark.read.parquet(store_path).select(
            F.col("day").alias("s_day"),
            F.col("sketch").alias("s_sketch"),
            F.col("n_rows").alias("s_n"),
        )
        merged = s.join(b, s["s_day"] == b["b_day"], "full_outer").select(
            F.coalesce("s_day", "b_day").alias("day"),
            F.when(
                F.col("s_sketch").isNotNull() & F.col("b_sketch").isNotNull(),
                F.hll_union("s_sketch", "b_sketch"),
            )
            .otherwise(F.coalesce("s_sketch", "b_sketch"))
            .alias("sketch"),
            (F.coalesce("s_n", F.lit(0)) + F.coalesce("b_n", F.lit(0))).alias(
                "n_rows"
            ),
        )
    else:
        merged = b.select(
            F.col("b_day").alias("day"),
            F.col("b_sketch").alias("sketch"),
            F.col("b_n").alias("n_rows"),
        )
    staging = f"{store_path}.staging-{uuid.uuid4().hex[:8]}"
    merged.coalesce(1).write.mode("overwrite").parquet(staging)
    old = f"{store_path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.isdir(store_path):
        os.rename(store_path, old)
    os.rename(staging, store_path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def run_sketch_rollup(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lg_k: int = 12,
):
    """Wire the sketch merge into foreachBatch. Returns the
    StreamingQuery; read the store with ``read_estimates``."""

    def handle(batch_df: DataFrame, _batch_id: int):
        merge_into_store(
            batch_day_sketches(batch_df, ts_col, key_col, lg_k), store_path
        )

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_estimates(spark, store_path: str) -> DataFrame:
    """(day, est_distinct, n_rows) from the store — plus use
    ``hll_union_agg`` over any day range for a range estimate."""
    return spark.read.parquet(store_path).select(
        "day",
        F.hll_sketch_estimate("sketch").alias("est_distinct"),
        "n_rows",
    )
