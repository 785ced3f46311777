"""GQL AST for the Spark engine.

Shapes follow the reference's AST (GraphLite `graphlite/src/ast/ast.rs`)
but only carry what the DataFrame compiler needs — the reference's
1,798-line enum collapses to small dataclasses here because Spark's
Column/DataFrame layer is the runtime value system.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

# --------------------------------------------------------------------------
# Expressions (reference: ast.rs:561-607 Expression enum)


class Expr:
    pass


@dataclass
class Literal(Expr):
    value: Any  # python int/float/str/bool/None


@dataclass
class ListLiteral(Expr):
    items: list[Expr]


@dataclass
class PathLit(Expr):
    """``PATH [n1, e1, n2, ...]`` literal path constructor
    (reference ast.rs:1227-1231 PathConstructor; executed at
    exec/executor.rs:4900-4954: even indices are node ids, odd indices
    edge ids, each a string or number)."""

    items: list[Expr]


@dataclass
class Var(Expr):
    name: str


@dataclass
class Prop(Expr):
    """``n.key`` property access (ast.rs PropertyAccess)."""

    var: str
    key: str


@dataclass
class Param(Expr):
    name: str


@dataclass
class Unary(Expr):
    op: str  # NOT, -, +
    operand: Expr


@dataclass
class Binary(Expr):
    """ops: + - * / % ^  = <> < <= > >=  AND OR XOR  IN  || (concat)
    CONTAINS STARTS_WITH ENDS_WITH LIKE =~ ~= WITHIN (ast.rs:569-607)."""

    op: str
    left: Expr
    right: Expr


@dataclass
class IsPredicate(Expr):
    """IS [NOT] predicate (ast.rs:1580-1611, IsPredicateType).

    ``what`` is one of NULL | TRUE | FALSE | UNKNOWN | NORMALIZED |
    DIRECTED | SOURCE | DESTINATION | TYPED | LABEL. SOURCE/DESTINATION
    carry an optional ``target`` edge expression (`n IS SOURCE OF e`);
    TYPED carries ``type_name``; LABEL carries ``labels`` (the `|`/`:`
    alternation terms, '%' = wildcard)."""

    operand: Expr
    what: str
    negated: bool = False
    target: "Expr | None" = None
    type_name: "str | None" = None
    labels: "tuple[str, ...] | None" = None


@dataclass
class Case(Expr):
    operand: Optional[Expr]  # simple CASE when set
    whens: list[tuple[Expr, Expr]] = field(default_factory=list)
    else_: Optional[Expr] = None


@dataclass
class Cast(Expr):
    operand: Expr
    type_name: str  # normalized upper-case TypeSpec name (ast.rs:815-878)


@dataclass
class FuncCall(Expr):
    name: str  # upper-cased
    args: list[Expr]
    distinct: bool = False  # COUNT(DISTINCT x)


@dataclass
class CountStar(Expr):
    pass


@dataclass
class Index(Expr):
    operand: Expr
    index: Expr


@dataclass
class Quantified(Expr):
    """x <op> ALL/ANY/SOME (list-expr) (ast.rs:1319-1334; the reference
    quantifies over subqueries — we quantify over list values, which the
    subquery form reduces to after COLLECT)."""

    op: str
    quant: str  # ALL | ANY | SOME
    left: Expr
    right: Expr


@dataclass
class ScalarSubquery(Expr):
    """VALUE { <query> }: single-value subquery in an expression
    (ast.rs ScalarSubquery; executor.rs:1100-1178). Compiled by hoisting:
    the 1x1 result is broadcast-cross-joined into the frame."""

    query: Any


@dataclass
class ExistsSubquery(Expr):
    """EXISTS { <pattern> [WHERE ...] } (ast.rs:1249-1260)."""

    patterns: list["PathPattern"]
    where: Optional[Expr] = None
    negated: bool = False


@dataclass
class QuantifiedSubquery(Expr):
    """``x <op> ALL/ANY/SOME ( <query> )`` (ast.rs:1328-1334; the
    reference parses this but its executor rejects it at runtime,
    executor.rs:4508-4518 — we implement it, beyond reference).
    Ordered ops reduce to one broadcast min/max/count row; ``= ANY`` /
    ``<> ALL`` rewrite to the semi/anti-join InSubquery form."""

    op: str
    quant: str  # ALL | ANY | SOME
    left: Expr
    query: Any


@dataclass
class InSubquery(Expr):
    """``x [NOT] IN ( <query> )`` (ast.rs:1263-1276; parser.rs:1711-1830
    parses the parenthesized basic-query form). Compiled as a distributed
    left-semi / left-anti join on the subquery's single output column —
    never a driver-side collected list."""

    expr: Expr
    query: Any
    negated: bool = False


# --------------------------------------------------------------------------
# Patterns (reference: ast.rs:270-370)


@dataclass
class NodePattern:
    var: Optional[str]
    labels: list[str]
    props: dict[str, Expr] = field(default_factory=dict)


@dataclass
class EdgePattern:
    var: Optional[str]
    types: list[str]
    props: dict[str, Expr] = field(default_factory=dict)
    direction: str = "out"  # out | in | both (undirected '-' == both)
    quant: Optional[tuple[int, Optional[int]]] = None  # {n}, {n,m}, {n,}, *
    mode: str = "WALK"  # WALK | TRAIL | SIMPLE | ACYCLIC


@dataclass
class PathPattern:
    """Alternating [Node, Edge, Node, Edge, ..., Node]."""

    elements: list[Any]
    var: Optional[str] = None  # p = (a)-[..]->(b)


# --------------------------------------------------------------------------
# Clauses / query (reference: ast.rs:141-265, 417-479)


@dataclass
class SortItem:
    expr: Expr
    asc: bool = True
    nulls_first: Optional[bool] = None


@dataclass
class ReturnItem:
    expr: Expr
    alias: Optional[str]


@dataclass
class MatchClause:
    patterns: list[PathPattern]
    where: Optional[Expr] = None
    optional: bool = False


@dataclass
class WithClause:
    items: list[ReturnItem]
    distinct: bool = False
    where: Optional[Expr] = None
    order_by: list[SortItem] = field(default_factory=list)
    skip: Optional[int] = None
    limit: Optional[int] = None


@dataclass
class UnwindClause:
    expr: Expr
    alias: str


@dataclass
class ReturnClause:
    items: list[ReturnItem]
    distinct: bool = False
    order_by: list[SortItem] = field(default_factory=list)
    skip: Optional[int] = None
    limit: Optional[int] = None
    group_by: list[Expr] = field(default_factory=list)  # SELECT form
    having: Optional[Expr] = None
    # None = plain GROUP BY; "rollup"/"cube" = multi-dimensional subtotals
    # (beyond-reference: SURVEY §2.4 notes the reference lacks these)
    group_mode: Optional[str] = None


@dataclass
class Query:
    """Linear pipeline of clauses ending in RETURN (ast.rs Query::Basic +
    WithQuery pipelines, executor.rs:1179-1285)."""

    clauses: list[Any] = field(default_factory=list)


@dataclass
class SetOp:
    """UNION/INTERSECT/EXCEPT [ALL] (ast.rs:208-215)."""

    op: str  # UNION | INTERSECT | EXCEPT
    all: bool
    left: Any  # Query | SetOp
    right: Any
