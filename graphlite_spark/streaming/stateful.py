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
