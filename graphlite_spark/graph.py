"""Property-graph data model on Spark DataFrames.

The reference engine models a graph as node/edge maps plus adjacency
indexes (GraphLite `graphlite/src/storage/graph_cache.rs:16-38`,
`storage/types.rs:68-134`). Spark-first, we instead store:

- one *typed* DataFrame per node label  (``_id`` + typed property columns)
- one *typed* DataFrame per edge label  (``_src``, ``_dst`` + properties)

This "shredded" layout is the scalable analogue of GraphLite's
label->ids indexes: a label scan is a single table scan (partition
pruning is free), properties stay strongly typed (predicate pushdown +
column pruning reach the parquet scan), and adjacency "indexes" are
simply the edge tables themselves, joinable on ``_src``/``_dst`` with
whatever strategy Catalyst picks (broadcast / shuffled-hash / SMJ).

Nodes with multiple labels appear in each label's table with the same
``_id``; ids must be unique graph-wide so entity-identity semantics
(DISTINCT / set ops, SURVEY §2.7) hold.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ID = "_id"
SRC = "_src"
DST = "_dst"


@dataclass
class EdgeType:
    """A typed edge table: ``df`` has ``_src``/``_dst`` plus property columns.

    ``src_label``/``dst_label`` give the compiler the endpoint node tables
    (GraphLite edges carry exactly one label, storage/types.rs:128-134).
    """

    name: str
    df: DataFrame
    src_label: str
    dst_label: str

    @property
    def properties(self) -> list[str]:
        return [c for c in self.df.columns if c not in (SRC, DST)]


@dataclass
class PropertyGraph:
    """A graph = {label: nodes_df} + {edge_label: EdgeType}."""

    spark: SparkSession
    nodes: dict[str, DataFrame] = field(default_factory=dict)
    edges: dict[str, EdgeType] = field(default_factory=dict)
    name: str = "graph"
    graph_type: object | None = None  # GraphTypeSpec when typed (ast.rs:749-812)
    # {label: (key_prop, decode)} where decode(Column[_id]) -> Column[key]:
    # declares that a label's natural key is recoverable from its graph id
    # (e.g. namespaced ids). Lets the compiler answer `n.key` from an edge
    # endpoint without scanning/joining the node table at all.
    key_derivations: dict[str, tuple] = field(default_factory=dict)

    # -- construction -----------------------------------------------------
    def add_nodes(self, label: str, df: DataFrame, id_col: str) -> "PropertyGraph":
        """Register a node table. ``id_col`` is renamed to ``_id`` (kept as a
        property too, so GQL can reference it by its natural name)."""
        if id_col != ID:
            df = df.withColumn(ID, F.col(id_col))
        self.nodes[label] = df
        return self

    def add_edges(
        self,
        name: str,
        df: DataFrame,
        src_col: str,
        dst_col: str,
        src_label: str,
        dst_label: str,
    ) -> "PropertyGraph":
        if src_col != SRC:
            df = df.withColumn(SRC, F.col(src_col))
        if dst_col != DST:
            df = df.withColumn(DST, F.col(dst_col))
        self.edges[name] = EdgeType(name, df, src_label, dst_label)
        return self

    def set_key_derivation(self, label: str, key_prop: str, decode) -> "PropertyGraph":
        """Declare that ``label``'s ``key_prop`` equals ``decode(_id)``.

        ``decode`` is Column -> Column and must be exact on every id of the
        label (the datasets here use ``_id = label_ns + key``, so the
        inverse is a subtraction). The compiler then elides node-table
        joins for variables whose only referenced properties are the key
        and/or ``_id`` — at scale that removes a full table scan plus a
        shuffle join per such variable.
        """
        self.key_derivations[label] = (key_prop, decode)
        return self

    # -- lookups used by the compiler -------------------------------------
    def node_labels(self) -> list[str]:
        return sorted(self.nodes)

    def edge_labels(self) -> list[str]:
        return sorted(self.edges)

    def nodes_for_label(self, label: str) -> DataFrame:
        if label not in self.nodes:
            raise KeyError(f"unknown node label {label!r}; have {self.node_labels()}")
        return self.nodes[label]

    def edge_type(self, name: str) -> EdgeType:
        if name not in self.edges:
            raise KeyError(f"unknown edge label {name!r}; have {self.edge_labels()}")
        return self.edges[name]

    def edge_types_between(
        self, src_label: str | None, dst_label: str | None
    ) -> list[EdgeType]:
        """All edge types compatible with the given endpoint labels (either
        side may be None = unconstrained). Used when a pattern omits the
        edge label."""
        out = []
        for et in self.edges.values():
            if src_label is not None and et.src_label != src_label:
                continue
            if dst_label is not None and et.dst_label != dst_label:
                continue
            out.append(et)
        return out

    def all_nodes(self, columns: list[str] | None = None) -> DataFrame:
        """Union of every label table on (id, label [, requested props]).

        A label-free scan is inherently a multi-table union in the shredded
        layout; only columns common to all tables (or requested) survive.
        """
        parts = []
        for label, df in sorted(self.nodes.items()):
            cols = [F.col(ID), F.lit(label).alias("_label")]
            for c in columns or []:
                cols.append(
                    F.col(c) if c in df.columns else F.lit(None).alias(c)
                )
            parts.append(df.select(*cols))
        if not parts:
            raise ValueError("graph has no node tables")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
