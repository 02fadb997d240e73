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


def zorder_key(bounds: dict[str, tuple[float, float]], bits: int = 8):
    """Morton (Z-order) key Column from per-column (min, max) bounds:
    each column min-max-normalizes to a ``bits``-bit integer bucket,
    then the buckets' bits interleave (col c contributes bit i to
    position i*k + c). Pure JVM bit arithmetic — codegen'd, no UDF.

    k·bits must fit a long; bits=8 with up to 4 columns is plenty:
    pruning only needs enough resolution to separate row groups."""
    from pyspark.sql import functions as F

    cols = list(bounds)
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"zorder_key: {k} cols x {bits} bits exceeds a long")
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for c, name in enumerate(cols):
        lo, hi = bounds[name]
        span = (hi - lo) or 1.0
        bucket = F.least(
            F.lit(top).cast("long"),
            F.floor((F.col(name).cast("double") - F.lit(float(lo))) / F.lit(span) * top),
        )
        bucket = F.greatest(F.lit(0).cast("long"), bucket)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(bucket, i).bitwiseAND(F.lit(1)), i * k + c)
            )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Z-order-clustered parquet write — MULTI-column min-max pruning.

    ``write_clustered`` gives disjoint row-group ranges on ONE key;
    a query filtering a different column gets no pruning. Z-ordering
    interleaves the bits of every clustering column's normalized rank,
    so row groups become axis-aligned hypercubes: a selective filter
    on ANY subset of the z-columns skips most row groups from footer
    stats alone (the Delta/Iceberg OPTIMIZE ZORDER story, done with
    plain Spark + parquet).

    Cost: one bounded stats scan (2·k scalars to the driver) + one
    range shuffle — same as the linear clusterer. The z-key is
    computed with JVM bit ops (no UDF) and dropped before write."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[
            f
            for c in zorder_cols
            for f in (F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}"))
        ]
    ).first()
    bounds = {
        c: (float(stats[f"__lo_{c}"]), float(stats[f"__hi_{c}"])) for c in zorder_cols
    }
    z = zorder_key(bounds, bits=bits)
    d = df.withColumn("__zkey", z)
    if num_files:
        d = d.repartitionByRange(num_files, "__zkey")
    else:
        d = d.repartitionByRange("__zkey")
    (
        d.sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .options(**options)
        .parquet(path)
    )


def compact_table(
    spark,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_mb``-sized files (optionally re-clustered on
    ``sort_cols``), swapping atomically by rename. Returns
    {files_before, files_after, bytes}.

    The 100 TB maintenance story: streaming sinks and per-batch
    partition writes accumulate small files whose per-file open/footer
    cost eventually dominates scans; periodic compaction restores
    ~row-group-sized files. File count derives from the actual on-disk
    bytes (a bounded directory listing, no data read)."""
    import os
    import shutil
    import uuid

    files = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(path)
        for f in fn
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    staging = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(staging)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    after = [
        f for dp, _dn, fn in os.walk(path) for f in fn if f.endswith(".parquet")
    ]
    return {"files_before": len(files), "files_after": len(after), "bytes": total}
