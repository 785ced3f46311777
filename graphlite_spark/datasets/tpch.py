"""Map the driver's TPC-H-ish parquet tables onto a property graph.

Node labels keep their natural keys as ``_id`` and original column
names as properties, so every GQL query over the graph has an obvious
ANSI-SQL oracle over the raw tables.

Graph schema:

    (Customer)-[:PLACED]->(Order)
    (Order)-[:LINE {l_*}]->(Part)          # one edge per lineitem row
    (Supplier)-[:SUPPLIES {l_*}]->(Part)   # lineitem, keyed by suppkey
    (Customer)-[:FROM_NATION]->(Nation)
    (Supplier)-[:IN_NATION]->(Nation)
    (Nation)-[:IN_REGION]->(Region)

Node ids are made globally unique by namespacing: each label table's
``_id`` is ``label_prefix * 10^12 + natural_key`` — cheap, collision
free at any realistic scale, and keeps ids as longs for fast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import PropertyGraph

_LABEL_NS = {
    "Region": 1,
    "Nation": 2,
    "Customer": 3,
    "Supplier": 4,
    "Part": 5,
    "Order": 6,
    "Event": 7,
    "User": 8,
    "Document": 9,
}
_NS = 10**12


def _nid(label: str, col) -> object:
    return (F.lit(_LABEL_NS[label] * _NS) + col.cast("long")).alias("_id")


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    long (spark.sql.legacy.parquet.nanosAsLong=true); we convert to
    microsecond timestamps at load so the engine sees TimestampType."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path.removeprefix("file:"))
    out = []
    for f in schema:
        t = f.type
        if str(t).startswith("timestamp[ns"):
            out.append(f.name)
    return out


_DISTRIBUTE_MIN_ROWS = 100_000


def load_table(
    spark: SparkSession, sf_dir: str, name: str, distribute: bool = False
) -> DataFrame:
    """Read one table; optionally redistribute an under-parallel file.

    Parquet splits at row-group granularity and the driver's testdata is
    one row group per file, so every scan starts as a single task.
    ``distribute=True`` inserts one round-robin repartition to the
    session's core count (gated on table size so small tables keep their
    bare pruned-scan plans). Measured A/B at sf0.1 (600k-row lineitem):
    the extra exchange LOSES for scan→aggregate shapes (agg_q1 0.91s →
    1.21s; q5 star join 0.97s → 1.59s) because Catalyst's map-side
    partial aggregation inside the scan stage already collapses the data
    before any shuffle — so the default stays False. Turn it on only
    when the per-row downstream work is heavy enough to dwarf an
    exchange (e.g. Pandas-UDF feature extraction over a single-file
    input); a real 100 TB table arrives as thousands of row groups and
    never needs it.
    """
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for c in _ns_timestamp_cols(path):
        df = df.withColumn(c, F.timestamp_micros((F.col(c) / 1000).cast("long")))
    if distribute:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path.removeprefix("file:")).metadata
        para = spark.sparkContext.defaultParallelism
        if meta.num_rows >= _DISTRIBUTE_MIN_ROWS and meta.num_row_groups < para:
            df = df.repartition(para)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    names = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {n: load_table(spark, sf_dir, n) for n in names}


def tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    t = load_tables(spark, sf_dir)
    g = PropertyGraph(spark, name="tpch")

    def nodes(label: str, df: DataFrame, key: str) -> None:
        g.add_nodes(label, df.withColumn("_id", _nid(label, F.col(key))), "_id")
        # the namespaced id is invertible: key = _id - ns. Declaring that
        # lets the compiler answer `n.<key>` straight from edge endpoints
        # (cast back so derived values keep the source column's type)
        ns = _LABEL_NS[label] * _NS
        ktype = dict(df.dtypes)[key]
        g.set_key_derivation(
            label, key, lambda c, _ns=ns, _kt=ktype: (c - F.lit(_ns)).cast(_kt)
        )

    nodes("Region", t["region"], "r_regionkey")
    nodes("Nation", t["nation"], "n_nationkey")
    nodes("Customer", t["customer"], "c_custkey")
    nodes("Supplier", t["supplier"], "s_suppkey")
    nodes("Part", t["part"], "p_partkey")
    nodes("Order", t["orders"], "o_orderkey")

    def edge(name, df, src_expr, dst_expr, src_label, dst_label, props=()):
        edf = df.select(
            src_expr.alias("_src"),
            dst_expr.alias("_dst"),
            *[F.col(p) for p in props],
        )
        g.add_edges(name, edf, "_src", "_dst", src_label, dst_label)

    edge(
        "PLACED",
        t["orders"],
        _nid("Customer", F.col("o_custkey")),
        _nid("Order", F.col("o_orderkey")),
        "Customer",
        "Order",
    )
    li_props = [c for c in t["lineitem"].columns]
    edge(
        "LINE",
        t["lineitem"],
        _nid("Order", F.col("l_orderkey")),
        _nid("Part", F.col("l_partkey")),
        "Order",
        "Part",
        li_props,
    )
    edge(
        "SUPPLIES",
        t["lineitem"],
        _nid("Supplier", F.col("l_suppkey")),
        _nid("Part", F.col("l_partkey")),
        "Supplier",
        "Part",
        li_props,
    )
    edge(
        "FROM_NATION",
        t["customer"],
        _nid("Customer", F.col("c_custkey")),
        _nid("Nation", F.col("c_nationkey")),
        "Customer",
        "Nation",
    )
    edge(
        "IN_NATION",
        t["supplier"],
        _nid("Supplier", F.col("s_suppkey")),
        _nid("Nation", F.col("s_nationkey")),
        "Supplier",
        "Nation",
    )
    edge(
        "IN_REGION",
        t["nation"],
        _nid("Nation", F.col("n_nationkey")),
        _nid("Region", F.col("n_regionkey")),
        "Nation",
        "Region",
    )

    # Event/User subgraph from the events table — gives the graph a
    # self-referencing edge type (Event-FOLLOWS->Event: each user's events
    # in ts order) so variable-length path operators have a real workload.
    from pyspark.sql import Window

    ev = t["events"]
    nodes("Event", ev, "event_id")
    users = ev.select(F.col("user_id").alias("user_id")).distinct()
    nodes("User", users, "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    follows = (
        ev.withColumn("_next", F.lead("event_id").over(w))
        .filter(F.col("_next").isNotNull())
        .select(
            _nid("Event", F.col("event_id")).alias("_src_raw"),
            _nid("Event", F.col("_next")).alias("_dst_raw"),
        )
    )
    g.add_edges(
        "FOLLOWS",
        follows.select(F.col("_src_raw").alias("_src"), F.col("_dst_raw").alias("_dst")),
        "_src",
        "_dst",
        "Event",
        "Event",
    )
    nodes("Document", t["documents"], "doc_id")
    edge(
        "PERFORMED",
        ev,
        _nid("User", F.col("user_id")),
        _nid("Event", F.col("event_id")),
        "User",
        "Event",
    )
    return g
