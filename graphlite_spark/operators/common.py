"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow(df: DataFrame, key: str) -> DataFrame:
    """Spread rows to shuffle width before an expensive NARROW stage
    (explode-heavy projections, per-row decode/parse in mapInPandas):
    such stages inherit the SCAN's split count, and a compact parquet
    corpus would serialize the module's most expensive work onto a
    couple of cores (measured repeatedly in round 7: span_dedup 2x,
    gopher_repetition 7x, html extract 2.7x at sf1). No-op on a
    many-split 100 TB scan and on STREAMING frames (micro-batch
    parallelism is the source's concern, and .rdd is illegal there).

    Only use where the downstream per-row work dwarfs one shuffle of
    the rows — header-only triage (probe_media) must NOT spread."""
    if df.isStreaming:
        return df
    shuffle_n = int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    if df.rdd.getNumPartitions() < shuffle_n:
        return df.repartition(shuffle_n, key)
    return df
