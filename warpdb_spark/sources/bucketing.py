"""Bucketed tables for shuffle-free co-located joins (100 TB stance).

Repeated fact-fact joins on the same key (orders ⋈ lineitem on
orderkey, every day) should not re-shuffle both sides every run:
bucketing pre-partitions the data on disk by hash(key) so Spark plans a
SortMergeJoin with NO Exchange. This is the persistent analog of the
reference's range-partition-per-device layout
(src/multi_gpu_utils.cpp:23-60) — partitioning decided at write time,
reused by every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table (bucket metadata requires the
    catalog — plain parquet paths can't carry it)."""
    spark = df.sparkSession
    if mode == "overwrite":
        # a previous session may have left the managed location behind
        # without a catalog entry; saveAsTable refuses to reuse it
        spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = warehouse.removeprefix("file:") + "/" + table_name.lower()
        import shutil

        shutil.rmtree(loc, ignore_errors=True)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
