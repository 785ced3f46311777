"""Graph types: optional typed-schema layer with INSERT enforcement.

Reference surface: CREATE GRAPH TYPE with vertex/edge type specs and
property type lists (GraphLite `graphlite/src/ast/ast.rs:749-812`),
enforcement config (`schema/enforcement/config.rs:11`) and ingestion
validators (`schema/integration/`). Here a GraphTypeSpec validates DML
against declared labels/edge types and property types; untyped graphs
stay schema-optional exactly like the reference's dynamic default.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

_TYPE_CHECKS = {
    "STRING": lambda v: isinstance(v, str),
    "INTEGER": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "BIGINT": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "FLOAT": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "DOUBLE": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "BOOLEAN": lambda v: isinstance(v, bool),
}


class GraphTypeError(ValueError):
    pass


@dataclass
class NodeTypeSpec:
    label: str
    properties: dict[str, str] = field(default_factory=dict)  # name -> TYPE


@dataclass
class EdgeTypeSpec:
    name: str
    src_label: str
    dst_label: str
    properties: dict[str, str] = field(default_factory=dict)


@dataclass
class GraphTypeSpec:
    name: str
    nodes: dict[str, NodeTypeSpec] = field(default_factory=dict)
    edges: dict[str, EdgeTypeSpec] = field(default_factory=dict)

    # -- validation (schema/integration ingestion validator analogue) ------
    def validate_node(self, labels: list[str], props: dict[str, Any]) -> None:
        for label in labels:
            spec = self.nodes.get(label)
            if spec is None:
                raise GraphTypeError(
                    f"label {label!r} not in graph type {self.name!r} "
                    f"(allowed: {sorted(self.nodes)})"
                )
            self._check_props(f"node :{label}", spec.properties, props)

    def validate_edge(self, etype: str, src_label: str, dst_label: str,
                      props: dict[str, Any]) -> None:
        spec = self.edges.get(etype)
        if spec is None:
            raise GraphTypeError(
                f"edge type {etype!r} not in graph type {self.name!r} "
                f"(allowed: {sorted(self.edges)})"
            )
        if (spec.src_label, spec.dst_label) != (src_label, dst_label):
            raise GraphTypeError(
                f"edge {etype!r} connects {spec.src_label}->{spec.dst_label}, "
                f"got {src_label}->{dst_label}"
            )
        self._check_props(f"edge :{etype}", spec.properties, props)

    @staticmethod
    def _check_props(what: str, declared: dict[str, str], props: dict[str, Any]) -> None:
        for k, v in props.items():
            if k not in declared:
                raise GraphTypeError(
                    f"{what}: undeclared property {k!r} (allowed: {sorted(declared)})"
                )
            if v is None:
                continue
            t = declared[k].upper()
            check = _TYPE_CHECKS.get(t)
            if check and not check(v):
                raise GraphTypeError(
                    f"{what}: property {k!r} expects {t}, got {type(v).__name__}"
                )


def parse_graph_type_body(text: str, name: str) -> GraphTypeSpec:
    """Parse the { ... } body of CREATE GRAPH TYPE:

        (Person {name STRING, age INTEGER}),
        (Person)-[KNOWS {since INTEGER}]->(Person)

    A pragmatic subset of the ISO GQL graph-type grammar (ast.rs:749-812).
    """
    from .gql.lexer import tokenize
    from .gql.parser import ParseError

    toks = tokenize(text)
    i = 0

    def cur():
        return toks[i]

    def eat(kind, value=None):
        nonlocal i
        t = toks[i]
        if t.kind != kind or (value is not None and t.value != value):
            raise ParseError(f"graph type: expected {value or kind}, got {t}")
        i += 1
        return t

    def ident():
        nonlocal i
        t = toks[i]
        if t.kind not in ("IDENT", "KEYWORD"):
            raise ParseError(f"graph type: expected name, got {t}")
        i += 1
        return t.text or t.value

    def props() -> dict[str, str]:
        nonlocal i
        out: dict[str, str] = {}
        if cur().kind == "OP" and cur().value == "{":
            eat("OP", "{")
            while not (cur().kind == "OP" and cur().value == "}"):
                pname = ident()
                ptype = ident().upper()
                if cur().kind == "OP" and cur().value == "(":
                    # STRING(32), DECIMAL(10,2): swallow params
                    depth = 0
                    while True:
                        t = eat(cur().kind)
                        if t.value == "(":
                            depth += 1
                        elif t.value == ")":
                            depth -= 1
                            if depth == 0:
                                break
                out[pname] = ptype
                if cur().kind == "OP" and cur().value == ",":
                    eat("OP", ",")
            eat("OP", "}")
        return out

    spec = GraphTypeSpec(name)
    eat("OP", "{")
    while not (cur().kind == "OP" and cur().value == "}"):
        eat("OP", "(")
        label = ident()
        p1 = props()
        eat("OP", ")")
        if cur().kind == "OP" and cur().value == "-":
            # (Src)-[EType {props}]->(Dst)
            eat("OP", "-")
            eat("OP", "[")
            ename = ident()
            ep = props()
            eat("OP", "]")
            eat("OP", "->")
            eat("OP", "(")
            dst = ident()
            eat("OP", ")")
            spec.edges[ename] = EdgeTypeSpec(ename, label, dst, ep)
        else:
            spec.nodes[label] = NodeTypeSpec(label, p1)
        if cur().kind == "OP" and cur().value == ",":
            eat("OP", ",")
    eat("OP", "}")
    return spec
