"""Event-time windowing + structured streaming (SURVEY §2.9).

The reference's only streaming facility is a chunked CSV loop
(src/csv_loader.cpp:186-223, src/warpdb.cpp:544-590) — a stateless
map-only pipeline. Spark's partitioned reads subsume that; this module
provides the principled superset: event-time tumbling/sliding/session
windows with watermarks, usable identically on batch DataFrames and
on ``readStream`` sources (the functions below take either).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: one state entry per (window, keys); with a
    watermark, state for closed windows is evicted — bounded memory on
    unbounded streams."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.window(ts_col, duration).alias("win"), *(keys or [])).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.window(ts_col, duration, slide).alias("win"), *(keys or [])).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: sessions close after ``gap`` of inactivity;
    window end = last event + gap (Spark semantics)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap).alias("win"), *(keys or [])).agg(*aggs)
    return out.select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        *[c for c in out.columns if c != "win"],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    keys: list[str],
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Key-equality join bounded by event time: match right rows with
    ``left_ts - lower <= right_ts <= left_ts + upper``.

    Works identically on batch DataFrames and on two ``readStream``
    sources (a stream-stream join). On streams, ``watermark`` must be
    set on both sides: Spark then derives the state-retention bound
    from the watermark + interval condition and evicts join state for
    rows that can no longer match — bounded memory on unbounded input.
    At batch scale the equality keys make this a hash join (one shuffle
    per side), never a time-range cross product.

    Column-name collisions between the two sides must be resolved by
    the caller (select/alias) beforehand, except the join keys, which
    must be named identically and are coalesced by Spark's ``on`` list
    only in batch mode — here the condition is explicit, so both sides
    keep their key columns.
    """
    lcols = set(left.columns)
    rcols = set(right.columns)
    dup = (lcols & rcols) - {left_ts, right_ts}
    if dup - set(keys):
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(dup - set(keys))}"
        )
    lw = _with_watermark(left, left_ts, watermark).alias("l")
    rw = _with_watermark(right, right_ts, watermark).alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    time_cond = (
        F.col(f"r.{right_ts}")
        >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
    ) & (
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
    )
    cond = cond & time_cond if cond is not None else time_cond
    joined = lw.join(rw, cond, how)
    # project: left columns, then right's non-key non-duplicate columns
    out_cols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"r.{c}").alias(c)
        for c in right.columns
        if c not in keys and c not in lcols
    ]
    return joined.select(*out_cols)


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming deduplication by key.

    With ``ts_col`` + ``watermark`` on a stream, uses
    ``dropDuplicatesWithinWatermark``: state for a key is evicted once
    the watermark passes it — bounded memory on unbounded streams (the
    plain ``dropDuplicates`` on a stream keeps ALL keys forever, which
    at 100 TB/day of events is an OOM, not an operator). On batch input
    it is a plain dropDuplicates on the keys."""
    if df.isStreaming and ts_col is not None and watermark is not None:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def read_csv_stream(spark, path: str, schema, max_files_per_trigger: int = 1) -> DataFrame:
    """The chunked-CSV analog as a real stream: file micro-batches."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("header", True)
        .csv(path)
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    name: str,
    timeout_sec: int = 60,
    output_mode: str | None = None,
):
    """Drain an availableNow stream into an in-memory table (tests /
    small jobs); returns the StreamingQuery after it finishes.

    ``output_mode`` defaults by plan shape: 'complete' when the stream
    aggregates (Spark requires it without a watermark), 'append' for
    map-only streams (where 'complete' is rejected)."""
    if output_mode is None:
        plan = stream_df._jdf.queryExecution().logical().toString()
        output_mode = "complete" if "Aggregate" in plan else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def write_exactly_once(
    stream_df,
    path: str,
    checkpoint: str,
    partition_col: str = "__batch_id",
):
    """Exactly-once file sink via foreachBatch + idempotent overwrite.

    Structured Streaming's contract with ``foreachBatch`` is
    at-least-once: after a crash the last batch REPLAYS with the same
    ``batch_id``. Writing each batch into its own static partition with
    dynamic partition-overwrite makes the replay idempotent — the
    retried batch atomically replaces its own partition and nothing
    else, upgrading the pipeline to effective exactly-once without a
    transactional table format. (Lakehouse formats get this from
    ``txnAppId``/``txnVersion``; this is the plain-parquet analog.)

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """
    from pyspark.sql import functions as F

    def write_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn(partition_col, F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def enrich_static(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of ``stream``
    joins the (bounded) ``dim`` table — the standard fact-stream ×
    dimension lookup. Works identically on batch DataFrames.

    Scale stance: the dim is explicitly broadcast (it is the small side
    by contract), so the stream side NEVER shuffles — enrichment stays
    a map-side operation per micro-batch, and Structured Streaming
    re-plans the dim scan every batch, so a dim updated in place (e.g.
    an overwritten parquet snapshot) is picked up without restarting
    the query. State-free: unlike stream-stream joins, no watermark
    is required."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=keys, how=how)
