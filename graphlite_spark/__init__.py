"""graphlite-spark: a PySpark-native engine with GraphLite's query surface.

Public API mirrors the reference Python SDK
(`/root/reference/sdk-python/src/graphlite_sdk/connection.py:38-150`):

    from graphlite_spark import GraphLiteSpark
    db = GraphLiteSpark(spark)           # or GraphLiteSpark.open(path)
    db.register_graph(graph)             # a PropertyGraph
    df = db.query("MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN ...")

Queries compile to lazy DataFrames; Catalyst owns physical execution.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .graph import EdgeType, PropertyGraph
from .session import get_spark

__all__ = [
    "GraphLiteSpark",
    "PropertyGraph",
    "EdgeType",
    "get_spark",
]

__version__ = "0.1.0"


class GraphLiteSpark:
    """Engine facade: graph catalog + GQL entry point."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._graphs: dict[str, PropertyGraph] = {}
        self._current: str | None = None

    # -- catalog ----------------------------------------------------------
    def register_graph(self, graph: PropertyGraph, name: str | None = None,
                       set_current: bool = True) -> None:
        name = name or graph.name
        self._graphs[name] = graph
        if set_current or self._current is None:
            self._current = name

    def graph(self, name: str | None = None) -> PropertyGraph:
        name = name or self._current
        if name is None or name not in self._graphs:
            raise KeyError(f"no graph {name!r}; registered: {sorted(self._graphs)}")
        return self._graphs[name]

    def list_graphs(self) -> list[str]:
        return sorted(self._graphs)

    def use_graph(self, name: str) -> None:
        if name not in self._graphs:
            raise KeyError(name)
        self._current = name

    # -- queries ----------------------------------------------------------
    def query(self, gql: str, params: dict[str, Any] | None = None,
              graph: str | None = None) -> DataFrame:
        """Compile a GQL query to a DataFrame (lazy)."""
        from .gql.compiler import QueryCompiler
        from .gql.parser import parse

        ast = parse(gql)
        return QueryCompiler(self.graph(graph), params).compile(ast)

    def explain(self, gql: str, params: dict[str, Any] | None = None) -> str:
        df = self.query(gql, params)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
