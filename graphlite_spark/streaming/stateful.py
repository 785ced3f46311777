"""Custom stateful streaming operators (applyInPandasWithState).

Beyond-reference surface: arbitrary per-key state machines over a
stream, the escape hatch when watermarked window aggregations can't
express the semantics. State lives in Spark's state store (checkpointed,
fault-tolerant); the Python side sees pandas batches per key.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def running_totals(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Running (count, sum, max) per key across the whole stream.

    Unlike a windowed aggregate, state never expires — this is the
    "lifetime counters" pattern (per-user token totals, per-source doc
    counts) used by ingestion pipelines. Works identically in batch via
    a plain groupBy fallback.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy(F.col(key_col).alias("key")).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("double")).alias("total_value"),
            F.max(F.col(value_col).cast("double")).alias("max_value"),
        )

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        n, total, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            vals = pdf[value_col].astype(float)
            n += len(pdf)
            total += float(vals.sum())
            batch_max = float(vals.max()) if len(vals) else None
            if batch_max is not None:
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return (
        events.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            RUNNING_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


DEDUP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("content_hash", LongType(), False),
    ]
)

_SEEN_SCHEMA = StructType([StructField("seen", LongType())])


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact content dedup over a document STREAM: the first document per
    content hash is emitted, every later duplicate (same batch or any
    later micro-batch) is dropped. The ingestion-side companion to
    operators.dedup.exact_dedup — dedupe-on-arrival instead of
    dedupe-after-landing.

    State per content hash is one row ("seen") in Spark's checkpointed
    state store, so the operator shuffles only (hash, id) pairs — 16
    bytes/doc — and survives restarts exactly-once. First-arrival wins
    (min id within the first micro-batch that carries the hash); the
    batch fallback keeps min(id) globally, identical when ids arrive in
    order or in one batch.
    """
    from pyspark.sql import functions as F

    key = F.lower(F.trim(F.col(text_col))) if normalize else F.col(text_col)
    hashed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.xxhash64(key).alias("content_hash"),
    )
    if not docs.isStreaming:
        return (
            hashed.groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "content_hash")
        )

    def update(key_, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        first = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                first = m if first is None else min(first, m)
        already = state.exists
        state.update((1,))
        if already or first is None:
            return
        yield pd.DataFrame({"doc_id": [first], "content_hash": [key_[0]]})

    return hashed.groupBy("content_hash").applyInPandasWithState(
        update,
        DEDUP_SCHEMA,
        _SEEN_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
