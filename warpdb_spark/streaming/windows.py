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
