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
