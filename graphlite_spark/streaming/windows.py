"""Structured Streaming operators (beyond-reference surface).

The reference engine has no streaming operators (SURVEY §2.10); its
`events`-style workloads run as batch scans. Here the same event schema
gets first-class streaming treatment: watermarked tumbling / sliding /
session windows, streaming dedup, and stateful counting — each usable
both on a stream (readStream) and on a batch DataFrame (identical
expressions), which is how the oracle checks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Count events per (tumbling window, key). Watermark bounds state on
    streams; on batch frames it is a no-op and is skipped."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("n"),
        )
    )


def sliding_mean(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(value_col), 6).alias("mean_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "mean_value")
    )


def session_windows(
    events: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session windows per key (gap-based); Spark's session_window handles
    merge-on-late-data on streams."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-style dedup on a stream: dropDuplicates bounded by a
    watermark (state eviction); identical call works on batch frames."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def run_stream_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain a bounded stream into an in-memory table (test/debug sink)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
