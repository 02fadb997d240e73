"""Streaming distribution-drift monitoring: PSI per micro-batch against
a standing baseline — the §2.9 streaming pillar married to the drift
triangle (``inventory/curation_ext.py``: Welch z / KS / PSI). A feature
or ingest pipeline wires ``attach_psi_monitor`` onto its stream and
alerts on the classic credit-scoring thresholds (PSI < 0.1 stable,
0.1-0.25 drifting, > 0.25 broken).

Exactness discipline (shared with ``events_psi_value_drift``): bucket
counts are exact integers, shares are ratios of those integers, each
bucket's PSI term is micro-snapped (×1e6, rounded to long) BEFORE the
sum so the fold is order-proof, and buckets empty on either side are
EXCLUDED and counted rather than epsilon-fudged (an epsilon turns a
structural zero into an unbounded log term).

Scale shape: one map-side-combined groupBy per batch collapses the
batch to bucket rows (bounded by the VALUE DOMAIN, ~20 at $25 width);
the baseline is a bounded bucket table that broadcasts; the monitor
output is one row per batch forever.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

BUCKET_CENTS = 2500  # $25 buckets — ≤ ~20 over the test value domain


def value_bucket_counts(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Exact integer (bucket, n) counts of the non-null values."""
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.floor(cents / BUCKET_CENTS).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_usable(n_c, n_b):
    """The structural-zero rule: a bucket contributes to PSI only when
    BOTH sides are non-empty; zeros are counted, never epsilon-fudged.
    Single source for the three PSI surfaces (events_psi_value_drift,
    stream_psi_drift_by_batch, psi_between)."""
    return (n_c > 0) & (n_b > 0)


def psi_snapped_term(n_c, n_b, tc, tb):
    """One bucket's PSI contribution as an exact micro-unit integer:
    (p_c − p_b)·ln(p_c/p_b) snapped to ×1e6 longs BEFORE the sum so the
    fold is aggregation-order-proof (all terms ≥ 0, so HALF_UP and
    round-half-away agree across engines). Callers sum these and
    divide by 1e6 once."""
    pc = n_c.cast("double") / tc
    pb = n_b.cast("double") / tb
    return F.round((pc - pb) * F.log(pc / pb) * 1e6, 0).cast("long")


def psi_between(cur: DataFrame, base: DataFrame) -> DataFrame:
    """One-row PSI report between two (bucket, n) count frames. Both
    frames are value-domain-bounded, so the join and the total-count
    denominators ride broadcasts — no full-frame shuffle."""
    c = cur.select("bucket", F.col("n").alias("n_c"))
    b = base.select("bucket", F.col("n").alias("n_b"))
    j = (
        c.join(b, "bucket", "full")
        .select(
            F.coalesce(F.col("n_c"), F.lit(0)).alias("n_c"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
        )
    )
    tot = j.agg(
        F.sum("n_c").alias("tc"), F.sum("n_b").alias("tb")
    )
    g = j.crossJoin(F.broadcast(tot))
    usable = psi_usable(F.col("n_c"), F.col("n_b"))
    term = psi_snapped_term(
        F.col("n_c"), F.col("n_b"), F.col("tc"), F.col("tb")
    )
    return g.agg(
        F.max("tc").alias("n_cur"),
        F.max("tb").alias("n_base"),
        F.sum(F.when(usable, 1).otherwise(0)).alias("n_buckets_used"),
        F.sum(F.when(usable, 0).otherwise(1)).alias("n_buckets_zero"),
        F.round(F.sum(F.when(usable, term).otherwise(0)) / 1e6, 6).alias(
            "psi"
        ),
    )


def attach_psi_monitor(
    stream_df: DataFrame,
    base_counts: DataFrame,
    out_dir: str,
    value_col: str = "value",
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Wire the PSI check into foreachBatch: each micro-batch's value
    distribution is scored against the standing baseline and ONE row
    (batch_id + psi report) lands in ``out_dir`` as a parquet
    partition keyed by batch_id — idempotent under foreachBatch's
    at-least-once replay (a replayed batch overwrites its own
    directory, the exactly-once discipline of
    streaming/windows.py::exactly_once_sink). Returns the started
    StreamingQuery."""
    spark = stream_df.sparkSession
    # pin the (tiny, bounded) baseline once; a live deployment would
    # refresh it on a schedule
    base_rows = base_counts.collect()
    schema = base_counts.schema

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        base = spark.createDataFrame(base_rows, schema)
        report = psi_between(value_bucket_counts(batch_df, value_col), base)
        # the partition DIRECTORY carries batch_id (reading the parent
        # surfaces it as a partition column; a column in the file too
        # would clash at read time)
        report.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        # drain what exists and TERMINATE — the batch-backfill/test
        # mode; without it the monitor runs until stopped
        writer = writer.trigger(availableNow=True)
    return writer.start()


def value_cent_counts(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Exact integer (cents, n) counts — the KS leg's support (KS
    compares ECDFs at every observed value, not at bucket edges)."""
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(cents.alias("cents"))
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ks_between(cur: DataFrame, base: DataFrame) -> DataFrame:
    """One-row two-sample KS report between two (cents, n) count
    frames — the single-batch twin of
    ``analytics_ext.stream_ks_drift_by_batch``: ECDF compare on the
    union support, integer cross-products |cum_c·tb − cum_b·tc| in
    DECIMAL(38,0), argmax pinned (diff DESC, cents ASC). The global
    cumulative window runs over a frame bounded by the VALUE DOMAIN
    (distinct cents), never corpus rows — same boundedness argument as
    the entry's per-batch partition."""
    from pyspark.sql.window import Window

    c = cur.select("cents", F.col("n").alias("n_c"))
    b = base.select("cents", F.col("n").alias("n_b"))
    j = c.join(b, "cents", "full").select(
        "cents",
        F.coalesce("n_c", F.lit(0)).alias("n_c"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = j.agg(F.sum("n_c").alias("tc"), F.sum("n_b").alias("tb"))
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    g = (
        j.select(
            "cents",
            F.sum("n_c").over(wcum).alias("cum_c"),
            F.sum("n_b").over(wcum).alias("cum_b"),
        )
        .crossJoin(F.broadcast(tot))
        # tc > 0 too (r8 advice): an EMPTY current micro-batch made
        # ks = 0/(0*tb) emit a row with NULL ks_d/ks_stat, which
        # downstream alerting could misread as a score; no row at all
        # is the unambiguous "nothing to compare" signal, matching the
        # no-baseline case.
        .filter((F.col("tb") > 0) & (F.col("tc") > 0))
    )
    dnum = F.abs(
        F.col("cum_c").cast("decimal(38,0)") * F.col("tb")
        - F.col("cum_b").cast("decimal(38,0)") * F.col("tc")
    )
    pick = Window.orderBy(F.desc("dnum"), F.asc("cents"))
    top = (
        g.select("cents", "tc", "tb", dnum.alias("dnum"))
        .withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
    )
    ks = F.col("dnum").cast("double") / (
        F.col("tc").cast("double") * F.col("tb")
    )
    return top.select(
        F.round(ks, 6).alias("ks_d"),
        F.round(F.col("cents") / 100.0, 2).alias("ks_at_value"),
        F.round(
            F.sqrt(
                F.col("tc").cast("double") * F.col("tb") / (F.col("tc") + F.col("tb"))
            )
            * ks,
            6,
        ).alias("ks_stat"),
    )


def attach_drift_monitor(
    stream_df: DataFrame,
    base_bucket_counts: DataFrame,
    base_cent_counts: DataFrame,
    out_dir: str,
    value_col: str = "value",
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """The UNIFIED drift monitor: one foreachBatch scoring each
    micro-batch on BOTH drift legs — PSI (binned shares; fires when
    mass moves between $25 buckets) and KS (ECDF shape; fires when
    mass moves WITHIN shared buckets, where PSI sleeps) — and writing
    ONE row per batch (psi report columns + ks_d/ks_at_value/ks_stat)
    to ``out_dir``, idempotent under at-least-once replay exactly like
    ``attach_psi_monitor``. Batch-replay twin:
    ``analytics_ext.stream_psi_drift_by_batch`` joined to
    ``stream_ks_drift_by_batch`` on batch_id
    (``stream_unified_drift_by_batch``); pinned equal in
    tests/test_streaming.py."""
    spark = stream_df.sparkSession
    base_b_rows = base_bucket_counts.collect()
    base_b_schema = base_bucket_counts.schema
    base_c_rows = base_cent_counts.collect()
    base_c_schema = base_cent_counts.schema

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        base_b = spark.createDataFrame(base_b_rows, base_b_schema)
        base_c = spark.createDataFrame(base_c_rows, base_c_schema)
        psi = psi_between(value_bucket_counts(batch_df, value_col), base_b)
        ks = ks_between(value_cent_counts(batch_df, value_col), base_c)
        psi.crossJoin(ks).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
