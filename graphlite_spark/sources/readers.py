"""Graph + corpus source readers.

The reference has no external readers (data enters via INSERT only —
SURVEY §2.2); Spark-first, ingestion is a first-class source layer:

- load_nodes / load_edges: build PropertyGraph tables from any
  spark.read-able format (parquet/csv/json/orc/delta)
- edge_list: classic (src, dst[, weight]) text/CSV edge lists
- documents_source: text corpora from parquet/jsonl with schema checks
- streaming_events: file-stream source for the events schema
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import PropertyGraph

_FORMATS = {"parquet", "csv", "json", "orc", "delta"}


def _read(spark: SparkSession, path: str, fmt: str, **options) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    if fmt == "json":
        reader = reader.option("multiLine", "false")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def load_nodes(
    graph: PropertyGraph,
    label: str,
    path: str,
    id_col: str,
    fmt: str = "parquet",
    **options,
) -> PropertyGraph:
    df = _read(graph.spark, path, fmt, **options)
    if id_col not in df.columns:
        raise ValueError(f"id column {id_col!r} not in {df.columns}")
    return graph.add_nodes(label, df.withColumn("_id", F.col(id_col)), "_id")


def load_edges(
    graph: PropertyGraph,
    name: str,
    path: str,
    src_col: str,
    dst_col: str,
    src_label: str,
    dst_label: str,
    fmt: str = "parquet",
    **options,
) -> PropertyGraph:
    df = _read(graph.spark, path, fmt, **options)
    for c in (src_col, dst_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    return graph.add_edges(name, df, src_col, dst_col, src_label, dst_label)


def edge_list(
    spark: SparkSession,
    path: str,
    delimiter: str = "\t",
    weighted: bool = False,
) -> DataFrame:
    """(src long, dst long[, weight double]) from a text edge list;
    '#' comment lines skipped — the SNAP-style interchange format."""
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    parts = F.split(F.col("value"), delimiter)
    out = lines.select(
        parts.getItem(0).cast("long").alias("_src"),
        parts.getItem(1).cast("long").alias("_dst"),
        *( [parts.getItem(2).cast("double").alias("weight")] if weighted else [] ),
    )
    return out.filter(F.col("_src").isNotNull() & F.col("_dst").isNotNull())


def documents_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: Optional[str] = None,
    **options,
) -> DataFrame:
    """Normalize a corpus to (doc_id long, text string, ...rest).
    Missing id → deterministic xxhash64 of the text (content addressing,
    collision-checked downstream by exact_dedup)."""
    df = _read(spark, path, fmt, **options)
    if text_col not in df.columns:
        raise ValueError(f"text column {text_col!r} not in {df.columns}")
    if text_col != "text":
        df = df.withColumnRenamed(text_col, "text")
    if id_col and id_col in df.columns:
        df = df.withColumn("doc_id", F.col(id_col).cast("long"))
    elif "doc_id" not in df.columns:
        df = df.withColumn("doc_id", F.xxhash64(F.col("text")))
    return df


def streaming_events(
    spark: SparkSession,
    path: str,
    schema=None,
    fmt: str = "parquet",
) -> DataFrame:
    """File-stream source over an events directory (new files are picked
    up incrementally — the standard bronze-layer ingestion pattern)."""
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    return spark.readStream.format(fmt).schema(schema).load(path)
