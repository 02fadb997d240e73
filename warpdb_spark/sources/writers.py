"""File sinks (superset — the reference has none, SURVEY §2.1 last row).

Includes the shared-location Arrow/Parquet handoff that replaces the
reference's POSIX-shm result export (src/arrow_utils.cpp:44-62): on a
cluster, "shared memory" between processes is a shared filesystem path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FORMATS = {"parquet", "csv", "json", "orc"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"Unsupported sink format: {fmt}")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing is the co-located-join primitive at 100 TB: two tables
    bucketed on the same key into the same bucket count join WITHOUT a
    shuffle (SortMergeJoin reads matching buckets side by side), and
    aggregations on the bucket key skip their exchange too. The cost is
    paid once at write time; every downstream join/agg on that key is
    then exchange-free. Use for fact tables that are repeatedly joined
    on the same key (orders⋈lineitem-style)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Sort-clustered parquet write — the min-max pruning primitive.

    Range-repartitions on the clustering key(s), then sorts within each
    partition, so every output file (and every parquet row-group inside
    it) covers a narrow, NON-overlapping key range. A selective filter
    on the key then skips whole row-groups from footer statistics alone
    — at 100 TB this is the difference between scanning the table and
    scanning the 0.1% of it the query touches. Complements
    ``write_bucketed``: bucket on the join key, cluster on the
    range-filter key (typically event time)."""
    if num_files:
        d = df.repartitionByRange(num_files, *cluster_cols)
    else:
        d = df.repartitionByRange(*cluster_cols)
    d.sortWithinPartitions(*cluster_cols).write.mode(mode).options(**options).parquet(path)
