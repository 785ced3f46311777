"""Streaming joins (beyond-reference surface, SURVEY §2.10).

The reference has no streaming at all; these are the two join shapes a
continuous training-data pipeline actually runs:

- enrich: stream ⋈ static dimension (metadata lookup). The dimension is
  broadcast — every microbatch joins map-side, no shuffle of the stream.
- interval_join: stream ⋈ stream on a key plus an event-time range
  (click ⋈ views in the preceding hour). With watermarks on both sides
  and a closed time constraint, Spark bounds the join state and evicts
  rows older than watermark+range — the standard stream-stream inner
  join recipe.

Both run identically on batch DataFrames (watermarks become no-ops),
which is how stream==batch tests and the DuckDB oracle check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _event_time(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    """Watermarks require TIMESTAMP; cast NTZ event-time columns first
    (batch frames too, so stream and batch plans stay identical)."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df


def enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a (possibly streaming) fact frame to a static dimension.

    Streams may only broadcast the static side; at 100 TB the dimension
    tables are the small side by construction (node/metadata tables), so
    the default broadcasts and each executor joins locally."""
    d = F.broadcast(dim) if broadcast_dim and not dim.isStreaming else dim
    return stream.join(d, on=on, how=how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    lookahead: str = "0 seconds",
    watermark: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join left rows to right rows with the same key whose
    timestamp falls in [left_ts - lookback, left_ts + lookahead].

    Right-side columns come back prefixed (`right_prefix`) so self-joins
    don't collide. On streams both inputs must be watermarked (done
    here) and the range condition is what lets Spark prove state is
    evictable; on batch frames the same plan is a plain range-condition
    join that AQE/Catalyst handle as an equi-join on the key with a
    residual time filter."""
    r = right.select([F.col(c).alias(right_prefix + c) for c in right.columns])
    left = _event_time(left, left_ts, watermark)
    r = _event_time(r, right_prefix + right_ts, watermark)
    rts = F.col(right_prefix + right_ts)
    cond = (
        (F.col(key) == F.col(right_prefix + key))
        & (rts >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (rts <= F.col(left_ts) + F.expr(f"INTERVAL {lookahead}"))
    )
    return left.join(r, cond, "inner")
