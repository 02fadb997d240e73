"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the session's
    parallelism. Compute-heavy per-row operators (minhash, simhash,
    feature extraction) otherwise run on however few partitions the
    scan produced — a single small parquet file means a single core. On
    a real cluster scans of large inputs already have enough splits and
    this is a no-op (no shuffle inserted)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
