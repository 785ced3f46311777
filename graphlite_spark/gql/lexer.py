"""GQL tokenizer.

Token-based, mirroring the surface the reference accepts (hand-rolled
lexer at GraphLite `graphlite/src/ast/lexer.rs`, ~1.9k LoC Rust): GQL
keywords, identifiers (plain + backquoted), numeric/string literals,
parameters ``$name``, multi-char operators (``<=`` ``>=`` ``<>`` ``=~``
``~=`` ``||`` ``..``), and ``//`` and ``/* */`` comments (no ``--``: it collides with ``-->`` edges).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    # clauses / statements
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "UNWIND", "AS",
    "ORDER", "BY", "ASC", "ASCENDING", "DESC", "DESCENDING", "LIMIT",
    "OFFSET", "SKIP", "DISTINCT", "ALL", "UNION", "INTERSECT", "EXCEPT",
    "GROUP", "HAVING", "SELECT", "FROM", "NULLS", "FIRST", "LAST", "LET",
    "FOR", "FILTER", "CALL", "YIELD", "NEXT", "AT", "EXISTS", "COUNT",
    # expressions
    "AND", "OR", "NOT", "XOR", "IN", "IS", "NULL", "TRUE", "FALSE",
    "CASE", "WHEN", "THEN", "ELSE", "END", "CAST", "LIKE", "CONTAINS",
    "STARTS", "ENDS", "ANY", "SOME", "WITHIN", "UNKNOWN", "EXTRACT",
    # path / graph
    "WALK", "TRAIL", "SIMPLE", "ACYCLIC", "SHORTEST", "PATH", "PATHS",
    # DML / DDL (parsed subset)
    "INSERT", "CREATE", "SET", "REMOVE", "DELETE", "DETACH", "DROP",
    "GRAPH", "SCHEMA", "SESSION", "USE", "TYPE", "TYPED",
    # misc
    "BETWEEN", "DIRECTED", "SOURCE", "DESTINATION", "NORMALIZED", "OF",
    # transactions
    "START", "COMMIT", "ROLLBACK", "TRANSACTION",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<LINE_COMMENT>//[^\n]*)
  | (?P<BLOCK_COMMENT>/\*.*?\*/)
  | (?P<NUMBER>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)
  | (?P<STRING>'(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.)*")
  | (?P<BQ_IDENT>`[^`]+`)
  | (?P<PARAM>\$[A-Za-z_][A-Za-z_0-9]*)
  | (?P<IDENT>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<OP><=|>=|<>|!=|=~|~=|\|\||\.\.|<-|->|<|>|=|\+|-|\*|/|%|\^|\(|\)|\[|\]|\{|\}|,|\.|:|;|\||\?)
    """,
    re.VERBOSE | re.DOTALL,
)


@dataclass
class Token:
    kind: str  # KEYWORD | IDENT | NUMBER | STRING | PARAM | OP | EOF
    value: str
    pos: int
    text: str = ""  # original source text (keywords keep their casing)

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}({self.value!r})"


class ParseError(ValueError):
    """Base syntax-error type for the whole GQL front end — defined
    here (the lowest layer) so lexing failures are catchable as parse
    errors, matching the reference's unified
    GraphLiteError::ParseError surface (ast/parser.rs)."""


class LexError(ParseError):
    pass


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise LexError(f"unexpected character {text[i]!r} at {i}: ...{text[max(0,i-20):i+20]!r}")
        kind = m.lastgroup
        val = m.group()
        i = m.end()
        if kind in ("WS", "LINE_COMMENT", "BLOCK_COMMENT"):
            continue
        if kind == "IDENT":
            up = val.upper()
            if up in KEYWORDS:
                out.append(Token("KEYWORD", up, m.start(), val))
            else:
                out.append(Token("IDENT", val, m.start()))
        elif kind == "BQ_IDENT":
            out.append(Token("IDENT", val[1:-1], m.start()))
        elif kind == "STRING":
            q = val[0]
            body = val[1:-1]
            if q == "'":
                body = body.replace("''", "'")
            body = re.sub(r"\\(.)", lambda mm: {"n": "\n", "t": "\t", "r": "\r"}.get(mm.group(1), mm.group(1)), body)
            out.append(Token("STRING", body, m.start()))
        elif kind == "PARAM":
            out.append(Token("PARAM", val[1:], m.start()))
        else:
            out.append(Token(kind, val, m.start()))
    out.append(Token("EOF", "", n))
    return out
