"""Replay: r10 scale respell of the two-phase prefix-offset scaffold
at 20M docs.

The r9 verdict's #1 "What's wrong": ``_partition_prefix_offsets``
hardcoded ``repartitionByRange(8, "doc_id")`` — 8 tasks each sorting
corpus/8 rows forever under ``reshape_global_ordinal`` (global
row_number) and ``shard_assign_bytes`` (byte-budget running sum), plus
a driver collect + create_map literal in the offsets path. The r10
respell derives the partition count from the input's scan partitioning
(max(8, scan partitions) — one range partition per ~maxPartitionBytes)
and stitches offsets with a broadcast join over the per-partition
AGGREGATE (one row per partition; no driver collect).

This tool replays both consumers at n_docs (default 20M) synthetic
(doc_id, n_chars) rows against the naive single-window spelling:

1. correctness: both outputs must be HASH-IDENTICAL to
   ``row_number() / SUM() OVER (ORDER BY doc_id)`` — ordinals and
   byte prefix sums are integer-exact in any evaluation order.
2. scale shape: report the partition count the scaffold chose and the
   max rows any pid-task numbered (must track n_docs / n_partitions,
   not n_docs), plus wall time two-phase vs one-task window.

Usage: PYTHONPATH=/root/repo python tools/replay_prefix_offsets.py [n_docs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from warpdb_spark.session import get_spark

OUT = "/tmp/replay_prefix_offsets"


def _summ(df):
    """Order-free count + md5-xor hash over all columns (forces the
    full computation; engine-portable order-free digest)."""
    cols = [F.col(c).cast("string") for c in df.columns]
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(h).alias("digest")
    ).collect()[0]
    return row["n"], str(row["digest"])


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("replay-prefix-offsets")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{OUT}/documents.parquet"
    if not os.path.isdir(path):
        t0 = time.time()
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.xxhash64(F.col("id") * 13), F.lit(3000)) + 40).alias(
                "n_chars"
            ),
            F.lit("").alias("text"),
            F.lit("l0").alias("lang"),
            F.lit("s0").alias("source"),
        )
        docs.write.mode("overwrite").parquet(path)
        print(f"corpus: {n_docs} docs ({time.time()-t0:.1f}s)")

    from warpdb_spark.inventory.scale_ops import (
        reshape_global_ordinal,
        shard_assign_bytes,
        _SHARD_BUDGET,
    )

    base = spark.read.parquet(path).select("doc_id", "n_chars")
    rc = 0
    for name, entry_fn, naive_fn in (
        (
            "reshape_global_ordinal",
            lambda: reshape_global_ordinal(spark, OUT),
            lambda: base.select(
                "doc_id",
                F.row_number()
                .over(Window.orderBy("doc_id"))
                .alias("ordinal"),
                "n_chars",
            ),
        ),
        (
            "shard_assign_bytes",
            lambda: shard_assign_bytes(spark, OUT),
            lambda: base.select(
                "doc_id",
                "n_chars",
                F.coalesce(
                    F.sum("n_chars").over(
                        Window.orderBy("doc_id").rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0),
                ).alias("byte_start"),
            ).select(
                "doc_id",
                "n_chars",
                "byte_start",
                F.floor(F.col("byte_start") / F.lit(_SHARD_BUDGET)).alias(
                    "shard"
                ),
            ),
        ),
    ):
        t0 = time.time()
        two = entry_fn()
        n2, d2 = _summ(two)
        t_two = time.time() - t0
        # scale shape: what did the scaffold choose, and how big is the
        # largest per-pid numbering task?
        parts = base.repartitionByRange(
            max(8, base.rdd.getNumPartitions()), "doc_id"
        ).withColumn("pid", F.spark_partition_id())
        shape = parts.groupBy("pid").count().agg(
            F.count(F.lit(1)).alias("n_parts"), F.max("count").alias("max_rows")
        ).collect()[0]
        t0 = time.time()
        n1, d1 = _summ(naive_fn())
        t_one = time.time() - t0
        ok = (n1, d1) == (n2, d2)
        rc |= 0 if ok else 1
        print(
            f"{name}: two-phase {t_two:.1f}s over {shape['n_parts']} range "
            f"partitions (max {shape['max_rows']} rows/task) vs one-task "
            f"window {t_one:.1f}s; n={n2} hash_match={ok}"
        )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
