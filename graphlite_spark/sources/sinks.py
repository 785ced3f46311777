"""Result sinks: the reference CLI's Table/JSON/CSV output formats
(docs/Architecture.md:660-666, json_format_tests.rs), plus distributed
writers for pipeline outputs.

format_rows renders driver-side for interactive use (small results);
write_results is the distributed path for anything big.
"""

from __future__ import annotations

import io
import json
from typing import Optional

from pyspark.sql import DataFrame


def format_rows(df: DataFrame, fmt: str = "table", limit: int = 1000) -> str:
    """Render a (small) result driver-side as table | json | csv."""
    rows = df.limit(limit).collect()
    cols = df.columns
    if fmt == "json":
        def clean(v):
            try:
                json.dumps(v)
                return v
            except TypeError:
                return str(v)

        return json.dumps(
            [{c: clean(r[c]) for c in cols} for r in rows],
            default=str,
        )
    if fmt == "csv":
        import csv

        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(cols)
        for r in rows:
            w.writerow([r[c] for c in cols])
        return buf.getvalue()
    if fmt == "table":
        widths = [
            max(len(c), *(len(str(r[c])) for r in rows)) if rows else len(c)
            for c in cols
        ]
        sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
        out = [sep, "|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|", sep]
        for r in rows:
            out.append(
                "|" + "|".join(f" {str(r[c]):<{w}} " for c, w in zip(cols, widths)) + "|"
            )
        out.append(sep)
        return "\n".join(out)
    raise ValueError(f"unknown format {fmt!r}; one of table|json|csv")


def write_results(df: DataFrame, path: str, fmt: str = "parquet",
                  mode: str = "overwrite", partition_by: Optional[list[str]] = None) -> None:
    """Distributed sink: parquet/csv/json directories (the scale path —
    results never funnel through the driver)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def write_parquet_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 256,
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
    sort_by: Optional[list[str]] = None,
    range_by: Optional[list[str]] = None,
    compression_ratio: float = 3.0,
) -> int:
    """Write parquet with a TARGET OUTPUT FILE SIZE — the small-files
    killer for pipeline sinks. A curation job that ends on the default
    shuffle partitioning writes however many files its last exchange
    had (thousands of KB-sized files at scale: metadata pressure on
    every later scan, and object-store request amplification);
    conversely one giant file serializes downstream parallelism.

    Sizing: Catalyst's optimized-plan size estimate (input-file bytes;
    no job launched) divided by an assumed parquet ``compression_ratio``
    (in-plan bytes are decompressed-ish; ~3x is a conservative default
    for columnar re-encoding) picks
        n_files = clamp(ceil(est_bytes / ratio / target_mb), 1, 100k).
    The repartition is a round-robin exchange — the one shuffle this
    writer adds — or hash-partitioned by ``partition_by`` when hive
    partitioning is requested so each output partition's files stay
    few. ``sort_by`` applies sortWithinPartitions before the write
    (row-group locality for the columns later scans filter on: parquet
    min/max page stats then actually prune). ``range_by`` goes
    further: repartitionByRange + sortWithinPartitions on those
    columns, so each output FILE covers a narrow, disjoint key range
    — a pushed point/IN predicate on the key then skips whole files
    by footer min/max, not just row groups (the round-robin
    ``sort_by`` layout sorts within files but every file still spans
    the full key range). Mutually exclusive with partition_by/sort_by.

    Returns the file count it targeted. For exactly-once streaming
    epochs use streaming/sinks.py; this is the batch sink.
    """
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    if compression_ratio <= 0:
        raise ValueError(
            f"compression_ratio must be positive, got {compression_ratio}")
    if range_by and (partition_by or sort_by):
        raise ValueError(
            "range_by is mutually exclusive with partition_by/sort_by")
    from graphlite_spark.operators.dedup import _plan_size_bytes

    est = _plan_size_bytes(df)
    if est >= 1 << 59:
        # estimate unavailable — keep the current layout: no
        # repartition (a round-robin shuffle to the SAME partition
        # count would move every row for nothing and destroy upstream
        # ordering). EXCEPT under range_by, whose disjoint-per-file
        # key-range guarantee is the caller's contract (pushdown
        # file skipping) — fall back to the current partition count
        # but still range-partition on the key.
        n_files = max(df.rdd.getNumPartitions(), 1)
        out = (df.repartitionByRange(n_files, *range_by)
               if range_by else df)
    else:
        n_files = int(-(-est / compression_ratio // (target_mb << 20)))
        n_files = min(max(n_files, 1), 100_000)
        if range_by:
            out = df.repartitionByRange(n_files, *range_by)
        elif partition_by:
            out = df.repartition(n_files, *partition_by)
        else:
            out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    if range_by:
        out = out.sortWithinPartitions(*range_by)
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return n_files
