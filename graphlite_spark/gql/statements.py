"""Statement-level GQL: DML / DDL / session / CALL / transactions.

Statement surface per the reference (GraphLite `graphlite/src/ast/
ast.rs:625-1063`, executor dispatch `exec/executor.rs:703-974`):
queries route to parser.parse(); everything else parses here into
small statement objects executed by graphlite_spark.dml.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from .ast import Expr, MatchClause, PathPattern
from .parser import ParseError, Parser

# ---------------------------------------------------------------------------
# Statement AST


@dataclass
class QueryStmt:
    ast: Any  # Query | SetOp


@dataclass
class InsertStmt:
    patterns: list[PathPattern]


@dataclass
class SetItem:
    var: str
    prop: Optional[str]  # None → label set (var:Label)
    label: Optional[str]
    value: Optional[Expr]


@dataclass
class MatchMutateStmt:
    """MATCH ... SET/REMOVE/DELETE/INSERT (write_engine match_* coordinators)."""

    matches: list[MatchClause]
    action: str  # SET | REMOVE | DELETE | DETACH_DELETE | INSERT
    set_items: list[SetItem] = field(default_factory=list)
    remove_items: list[tuple[str, str]] = field(default_factory=list)
    delete_vars: list[str] = field(default_factory=list)
    insert_patterns: list[PathPattern] = field(default_factory=list)


@dataclass
class CreateSchemaStmt:
    name: str
    if_not_exists: bool = False


@dataclass
class DropSchemaStmt:
    name: str
    if_exists: bool = False


@dataclass
class CreateGraphStmt:
    path: str
    if_not_exists: bool = False
    as_query: Optional[Any] = None
    typed: Optional[str] = None  # graph type name


@dataclass
class CreateGraphTypeStmt:
    name: str
    body: str  # { (Label {p TYPE}), (A)-[T {p TYPE}]->(B) }


@dataclass
class DropGraphTypeStmt:
    name: str
    if_exists: bool = False


@dataclass
class DropGraphStmt:
    path: str
    if_exists: bool = False


@dataclass
class TruncateGraphStmt:
    """TRUNCATE GRAPH / CLEAR GRAPH (ast.rs:625-644): drop all data,
    keep the graph (and its registered label/edge-type schemas)."""

    path: str
    kind: str = "TRUNCATE"  # TRUNCATE | CLEAR (synonymous data-clears)


@dataclass
class SessionSetStmt:
    kind: str  # GRAPH | SCHEMA | TIME_ZONE | PARAM
    value: Any
    name: Optional[str] = None  # parameter name for kind == PARAM


@dataclass
class SessionResetStmt:
    """SESSION RESET [ALL | PARAMETERS | TIME ZONE | GRAPH | SCHEMA]
    (ast.rs:991-1063)."""

    what: str = "ALL"


@dataclass
class SessionCloseStmt:
    pass


@dataclass
class DeclareStmt:
    """DECLARE name = <literal> (ast.rs:228-265): a session-scoped value
    binding, referenced as ``$name`` in later statements. (The reference
    also allows binding-table declarations; values cover the tested
    surface.)"""

    name: str
    value: Any


@dataclass
class AtStmt:
    """AT /schema <statement> (ast.rs:228-265): run one statement with a
    different default schema for bare graph names."""

    path: str
    body: str  # remaining statement text


@dataclass
class UserRoleStmt:
    """CREATE/DROP USER/ROLE (ast.rs:625-644; security metadata —
    enforcement is deployment-level, as in the reference's security/)."""

    action: str  # CREATE | DROP
    kind: str  # USER | ROLE
    name: str
    password: Optional[str] = None
    if_exists: bool = False


@dataclass
class GrantRevokeStmt:
    """GRANT <role|privilege ON target> TO name / REVOKE ... FROM name."""

    action: str  # GRANT | REVOKE
    what: str  # role name or privilege
    target: Optional[str]  # ON target (graph/schema path), if any
    to: str  # user or role name


@dataclass
class CallStmt:
    proc: str
    args: list[Expr]
    yield_cols: list[str] = field(default_factory=list)
    where: Optional[Expr] = None


@dataclass
class TxnStmt:
    kind: str  # START | COMMIT | ROLLBACK
    # START characteristics (parser.rs transaction_characteristics):
    isolation: Optional[str] = None  # READ UNCOMMITTED .. SERIALIZABLE
    access_mode: Optional[str] = None  # READ ONLY | READ WRITE


@dataclass
class CreateProcedureStmt:
    name: str
    body: str  # raw statement text, executed on CALL


@dataclass
class DropProcedureStmt:
    name: str
    if_exists: bool = False


@dataclass
class IndexStmt:
    """CREATE/DROP INDEX name ON <edge_label> TYPE <kind>
    (ast.rs:1707-1787; kinds AdjacencyList/PathIndex/ReachabilityIndex/
    PatternIndex, storage/indexes/types.rs:40-50)."""

    action: str  # CREATE | DROP
    name: str
    target: Optional[str] = None  # edge label
    kind: str = "ADJACENCYLIST"


@dataclass
class ExplainStmt:
    query_text: str
    mode: str = "formatted"  # formatted | extended | simple


class StatementParser(Parser):
    def parse_statement(self):
        t = self.cur
        if t.kind == "IDENT" and t.value.upper() == "EXPLAIN":
            self.advance()
            mode = "formatted"
            if self.cur.kind == "IDENT" and self.cur.value.upper() in (
                "FORMATTED", "EXTENDED", "SIMPLE", "COST", "CODEGEN",
            ):
                mode = self.advance().value.lower()
            return ExplainStmt(self.text[self.cur.pos:], mode)
        if t.kind == "IDENT" and t.value.upper() == "DECLARE":
            self.advance()
            name = self.ident()
            self.eat_op("=")
            from .ast import ListLiteral, Literal, Unary

            val = self.parse_expr()
            if isinstance(val, Unary) and val.op == "-" and isinstance(val.operand, Literal):
                val = Literal(-val.operand.value)
            if isinstance(val, ListLiteral) and all(
                isinstance(i, Literal) for i in val.items
            ):
                val = Literal([i.value for i in val.items])
            if not isinstance(val, Literal):
                raise ParseError("DECLARE takes a literal value")
            return self._done(DeclareStmt(name, val.value))
        if t.kind == "KEYWORD" and t.value == "AT":
            self.advance()
            path = self._path()
            body = self.text[self.cur.pos:].strip().rstrip(";")
            if not body:
                raise ParseError("AT needs a statement to run")
            return AtStmt(path, body)
        if t.kind == "IDENT" and t.value.upper() in ("GRANT", "REVOKE"):
            action = t.value.upper()
            self.advance()
            # privilege keywords (ALL, SELECT, INSERT, ...) or a role name
            what = (
                self.advance().value if self.cur.kind == "KEYWORD" else self.ident()
            )
            target = None
            if self._try_word("ON"):
                _ = self.try_kw("GRAPH") or self.try_kw("SCHEMA")
                target = self._path()
            kw = "TO" if action == "GRANT" else "FROM"
            if not self._try_word(kw):
                raise ParseError(f"expected {kw} at {self.cur.pos}")
            return self._done(GrantRevokeStmt(action, what, target, self.ident()))
        if t.kind == "IDENT" and t.value.upper() in ("TRUNCATE", "CLEAR"):
            kind = t.value.upper()
            self.advance()
            self.eat_kw("GRAPH")
            return self._done(TruncateGraphStmt(self._path(), kind))
        if t.kind != "KEYWORD":
            raise ParseError(f"expected statement, got {t}")
        k = t.value
        if k in ("MATCH", "OPTIONAL"):
            return self._match_or_mutate()
        if k in ("SELECT", "RETURN", "WITH", "UNWIND", "LET", "FILTER", "FOR"):
            return QueryStmt(self.parse())
        if k == "INSERT":
            self.advance()
            pats = [self.parse_path_pattern()]
            while self.at_op(","):
                self.advance()
                pats.append(self.parse_path_pattern())
            self._end()
            return InsertStmt(pats)
        if k == "CREATE":
            self.advance()
            if self.cur.kind == "IDENT" and self.cur.value.upper() == "INDEX":
                self.advance()
                name = self.ident()
                target = None
                kind = "ADJACENCYLIST"
                if self.cur.kind == "KEYWORD" and self.cur.value == "OF" or (
                    self.cur.kind == "IDENT" and self.cur.value.upper() == "ON"
                ):
                    self.advance()
                    target = self.ident()
                if self.at_kw("TYPE"):
                    self.advance()
                    kind = self.ident().upper()
                return self._done(IndexStmt("CREATE", name, target, kind))
            if self.cur.kind == "IDENT" and self.cur.value.upper() == "PROCEDURE":
                self.advance()
                name_parts = [self.ident()]
                while self.at_op("."):
                    self.advance()
                    name_parts.append(self.ident())
                if self.at_op("("):
                    self.advance()
                    self.eat_op(")")
                # body = rest of source text (NEXT-chained statements,
                # ast.rs:1189-1217 — stored as text, executed on CALL)
                body = self.text[self.cur.pos:].strip().rstrip(";")
                if not body:
                    raise ParseError("CREATE PROCEDURE needs a body")
                return CreateProcedureStmt(".".join(name_parts), body)
            if self.cur.kind == "IDENT" and self.cur.value.upper() in ("USER", "ROLE"):
                kind = self.advance().value.upper()
                name = self.ident()
                password = None
                if self._try_word("PASSWORD"):
                    if self.cur.kind != "STRING":
                        raise ParseError(f"expected password string at {self.cur.pos}")
                    password = self.advance().value
                return self._done(UserRoleStmt("CREATE", kind, name, password))
            if self.try_kw("SCHEMA"):
                ine = self._if_not_exists()
                return self._done(CreateSchemaStmt(self._path(), ine))
            if self.try_kw("GRAPH"):
                if self.try_kw("TYPE"):
                    name = self.ident()
                    body = self.text[self.cur.pos:].strip().rstrip(";")
                    if not body.startswith("{"):
                        raise ParseError("CREATE GRAPH TYPE needs a { ... } body")
                    return CreateGraphTypeStmt(name, body)
                ine = self._if_not_exists()
                path = self._path()
                typed = None
                if self.try_kw("TYPED"):
                    typed = self.ident()
                as_query = None
                if self.try_kw("AS"):
                    as_query = self.parse_set_query()
                return self._done(CreateGraphStmt(path, ine, as_query, typed))
            raise ParseError(f"unsupported CREATE target at {self.cur.pos}")
        if k == "DROP":
            self.advance()
            if self.cur.kind == "IDENT" and self.cur.value.upper() == "INDEX":
                self.advance()
                self._if_exists()
                return self._done(IndexStmt("DROP", self.ident()))
            if self.cur.kind == "IDENT" and self.cur.value.upper() == "PROCEDURE":
                self.advance()
                ie = self._if_exists()
                name_parts = [self.ident()]
                while self.at_op("."):
                    self.advance()
                    name_parts.append(self.ident())
                return self._done(DropProcedureStmt(".".join(name_parts), ie))
            if self.cur.kind == "IDENT" and self.cur.value.upper() in ("USER", "ROLE"):
                kind = self.advance().value.upper()
                ie = self._if_exists()
                return self._done(UserRoleStmt("DROP", kind, self.ident(), if_exists=ie))
            if self.try_kw("SCHEMA"):
                ie = self._if_exists()
                return self._done(DropSchemaStmt(self._path(), ie))
            if self.try_kw("GRAPH"):
                if self.try_kw("TYPE"):
                    ie = self._if_exists()
                    return self._done(DropGraphTypeStmt(self.ident(), ie))
                ie = self._if_exists()
                return self._done(DropGraphStmt(self._path(), ie))
            raise ParseError(f"unsupported DROP target at {self.cur.pos}")
        if k == "SESSION":
            self.advance()
            if self._try_word("RESET"):
                what = "ALL"
                if self._try_word("ALL"):
                    what = "ALL"
                elif self._try_word("PARAMETERS"):
                    what = "PARAMETERS"
                elif self._try_word("TIME"):
                    if not self._try_word("ZONE"):
                        raise ParseError(f"expected ZONE at {self.cur.pos}")
                    what = "TIME_ZONE"
                elif self.try_kw("GRAPH"):
                    what = "GRAPH"
                elif self.try_kw("SCHEMA"):
                    what = "SCHEMA"
                return self._done(SessionResetStmt(what))
            if self._try_word("CLOSE"):
                return self._done(SessionCloseStmt())
            self.eat_kw("SET")
            if self.try_kw("GRAPH"):
                return self._done(SessionSetStmt("GRAPH", self._path()))
            if self.try_kw("SCHEMA"):
                return self._done(SessionSetStmt("SCHEMA", self._path()))
            if self._try_word("TIME"):
                if not self._try_word("ZONE"):
                    raise ParseError(f"expected ZONE at {self.cur.pos}")
                if self.cur.kind != "STRING":
                    raise ParseError(
                        f"expected time zone string literal at {self.cur.pos}"
                    )
                return self._done(SessionSetStmt("TIME_ZONE", self.advance().value))
            if self._try_word("RESULT_CACHE"):
                # cache/result_cache.rs analogue: materialized results,
                # invalidated on graph writes
                if self._try_word("ON"):
                    return self._done(SessionSetStmt("RESULT_CACHE", True))
                if self._try_word("OFF"):
                    return self._done(SessionSetStmt("RESULT_CACHE", False))
                raise ParseError(f"expected ON|OFF at {self.cur.pos}")
            if self.cur.kind == "PARAM":
                pname = self.advance().value
                self.eat_op("=")
                from .ast import ListLiteral, Literal, Unary

                val = self.parse_expr()
                if isinstance(val, Unary) and val.op == "-" and isinstance(val.operand, Literal):
                    val = Literal(-val.operand.value)
                if isinstance(val, ListLiteral) and all(
                    isinstance(i, Literal) for i in val.items
                ):
                    val = Literal([i.value for i in val.items])
                if not isinstance(val, Literal):
                    raise ParseError("SESSION SET $param takes a literal value")
                return self._done(SessionSetStmt("PARAM", val.value, name=pname))
            raise ParseError(f"unsupported SESSION SET at {self.cur.pos}")
        if k == "USE":
            self.advance()
            self.try_kw("GRAPH")
            return self._done(SessionSetStmt("GRAPH", self._path()))
        if k == "CALL":
            self.advance()
            name_parts = [self.ident()]
            while self.at_op("."):
                self.advance()
                name_parts.append(self.ident())
            args: list[Expr] = []
            if self.at_op("("):
                self.advance()
                while not self.at_op(")"):
                    args.append(self.parse_expr())
                    if self.at_op(","):
                        self.advance()
                self.eat_op(")")
            ycols: list[str] = []
            if self.try_kw("YIELD"):
                ycols.append(self.ident())
                while self.at_op(","):
                    self.advance()
                    ycols.append(self.ident())
            where = self.parse_expr() if self.try_kw("WHERE") else None
            return self._done(CallStmt(".".join(name_parts), args, ycols, where))
        if k == "START":
            self.advance()
            self.try_kw("TRANSACTION")
            isolation = None
            access = None
            if self._try_word("ISOLATION"):
                if not self._try_word("LEVEL"):
                    raise ParseError(f"expected LEVEL after ISOLATION at {self.cur.pos}")
                if self._try_word("READ"):
                    if self._try_word("UNCOMMITTED"):
                        isolation = "READ UNCOMMITTED"
                    elif self._try_word("COMMITTED"):
                        isolation = "READ COMMITTED"
                    else:
                        raise ParseError(
                            f"expected UNCOMMITTED|COMMITTED at {self.cur.pos}"
                        )
                elif self._try_word("REPEATABLE"):
                    if not self._try_word("READ"):
                        raise ParseError(f"expected READ at {self.cur.pos}")
                    isolation = "REPEATABLE READ"
                elif self._try_word("SERIALIZABLE"):
                    isolation = "SERIALIZABLE"
                else:
                    raise ParseError(f"unknown isolation level at {self.cur.pos}")
            if self._try_word("READ"):
                if self._try_word("ONLY"):
                    access = "READ ONLY"
                elif self._try_word("WRITE"):
                    access = "READ WRITE"
                else:
                    raise ParseError(f"expected ONLY|WRITE at {self.cur.pos}")
            return self._done(TxnStmt("START", isolation, access))
        if k == "COMMIT":
            self.advance()
            return self._done(TxnStmt("COMMIT"))
        if k == "ROLLBACK":
            self.advance()
            return self._done(TxnStmt("ROLLBACK"))
        raise ParseError(f"unsupported statement {k} at {t.pos}")

    # -- helpers -----------------------------------------------------------
    def _try_word(self, w: str) -> bool:
        """Match a contextual word (keyword or identifier, case-insensitive)
        — transaction characteristics aren't reserved words in the lexer."""
        t = self.cur
        if t.kind in ("KEYWORD", "IDENT") and str(t.value).upper() == w:
            self.advance()
            return True
        return False

    def _end(self):
        if self.at_op(";"):
            self.advance()
        if self.cur.kind != "EOF":
            raise ParseError(f"trailing input at {self.cur.pos}: {self.cur}")

    def _done(self, stmt):
        self._end()
        return stmt

    def _if_not_exists(self) -> bool:
        if self.at_kw("IF"):  # IF isn't a keyword — identifier path
            pass
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "IF":
            self.advance()
            self.eat_kw("NOT") if self.at_kw("NOT") else None
            if self.cur.kind == "KEYWORD" and self.cur.value == "EXISTS":
                self.advance()
            return True
        return False

    def _if_exists(self) -> bool:
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "IF":
            self.advance()
            if self.cur.kind == "KEYWORD" and self.cur.value == "EXISTS":
                self.advance()
            return True
        return False

    def _path(self) -> str:
        """Catalog path: /schema/graph or bare name (ast.rs:726-740)."""
        parts = []
        if self.at_op("/"):
            self.advance()
            parts.append("")
        parts.append(self.ident())
        while self.at_op("/"):
            self.advance()
            parts.append(self.ident())
        return "/".join(parts)

    def _match_or_mutate(self):
        matches: list[MatchClause] = []
        while self.at_kw("MATCH") or (self.at_kw("OPTIONAL") and self.peek().value == "MATCH"):
            optional = self.try_kw("OPTIONAL")
            self.eat_kw("MATCH")
            pats = [self.parse_path_pattern()]
            while self.at_op(","):
                self.advance()
                pats.append(self.parse_path_pattern())
            where = self.parse_expr() if self.try_kw("WHERE") else None
            matches.append(MatchClause(pats, where, optional))
        if self.at_kw("SET"):
            self.advance()
            items = []
            while True:
                var = self.ident()
                if self.at_op("."):
                    self.advance()
                    prop = self.ident()
                    self.eat_op("=")
                    items.append(SetItem(var, prop, None, self.parse_expr()))
                elif self.at_op(":"):
                    self.advance()
                    items.append(SetItem(var, None, self.ident(), None))
                else:
                    raise ParseError(f"bad SET item at {self.cur.pos}")
                if self.at_op(","):
                    self.advance()
                    continue
                break
            return self._done(MatchMutateStmt(matches, "SET", set_items=items))
        if self.at_kw("REMOVE"):
            self.advance()
            items = []
            while True:
                var = self.ident()
                self.eat_op(".")
                items.append((var, self.ident()))
                if self.at_op(","):
                    self.advance()
                    continue
                break
            return self._done(MatchMutateStmt(matches, "REMOVE", remove_items=items))
        if self.at_kw("DELETE") or self.at_kw("DETACH"):
            detach = self.try_kw("DETACH")
            self.eat_kw("DELETE")
            dvars = [self.ident()]
            while self.at_op(","):
                self.advance()
                dvars.append(self.ident())
            return self._done(
                MatchMutateStmt(
                    matches,
                    "DETACH_DELETE" if detach else "DELETE",
                    delete_vars=dvars,
                )
            )
        if self.at_kw("INSERT"):
            # MATCH ... INSERT pattern (match_insert.rs): connect matched
            # nodes / create nodes per match
            self.advance()
            pats = [self.parse_path_pattern()]
            while self.at_op(","):
                self.advance()
                pats.append(self.parse_path_pattern())
            return self._done(
                MatchMutateStmt(matches, "INSERT", insert_patterns=pats)
            )
        # plain query: reparse from the top as a query
        self.i = 0
        return QueryStmt(self.parse())


def parse_statement(text: str):
    return StatementParser(text).parse_statement()


def split_next_chain(text: str) -> list[str]:
    """Split a top-level NEXT-chained statement into its parts
    (ast.rs:1082-1105 NEXT statement chaining; procedures use the same
    form). Only depth-0 NEXT keywords split; CREATE statements never do
    (their stored bodies own any NEXT chains inside)."""
    from .lexer import tokenize

    toks = tokenize(text)
    if toks and toks[0].kind == "KEYWORD" and toks[0].value == "CREATE":
        return [text]
    depth = 0
    cuts: list[int] = []
    for t in toks:
        if t.kind == "OP" and t.value in "([{":
            depth += 1
        elif t.kind == "OP" and t.value in ")]}":
            depth -= 1
        elif t.kind == "KEYWORD" and t.value == "NEXT" and depth == 0:
            cuts.append(t.pos)
    if not cuts:
        return [text]
    parts = []
    prev = 0
    for c in cuts:
        parts.append(text[prev:c])
        prev = c + len("NEXT")
    parts.append(text[prev:])
    return [p.strip() for p in parts if p.strip()]
