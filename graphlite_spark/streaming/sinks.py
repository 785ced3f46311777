"""Streaming sinks: idempotent foreachBatch writers.

Beyond-reference surface (the reference has no streaming at all,
SURVEY §2.10; its only sinks are CLI result formats,
docs/Architecture.md:660-666). At 100 TB-scale ingest the sink is where
exactly-once lives: Structured Streaming guarantees foreachBatch sees
each epoch at-least-once with a stable ``batch_id``, so a writer that
makes replays idempotent upgrades the pipeline to effectively
exactly-once end-to-end.

``idempotent_parquet_sink`` does that with the standard partition-
overwrite trick: every micro-batch writes to ``_batch_id=<id>``
partitions under dynamic partitionOverwriteMode, so a replayed epoch
overwrites its own directory instead of duplicating rows. Downstream
readers just read the root path.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame


def idempotent_parquet_sink(
    out_path: str,
    partition_by: Optional[list[str]] = None,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function writing parquet exactly-once.

    Each epoch lands in its own ``_batch_id`` partition; a replay of
    epoch k (after a failure between write and offset-commit) rewrites
    only that partition — idempotent by construction, no global locks.
    Extra ``partition_by`` columns nest *under* the batch partition so
    overwrite stays scoped to the replayed epoch.
    """

    def write(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        cols = ["_batch_id"] + (partition_by or [])
        (
            df.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*cols)
            .parquet(out_path)
        )

    return write


def run_stream_to_parquet(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    partition_by: Optional[list[str]] = None,
):
    """Drain a (bounded-source) stream into an idempotent parquet sink
    with availableNow, blocking until complete. Returns the query."""
    q = (
        df.writeStream.foreachBatch(idempotent_parquet_sink(out_path, partition_by))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
