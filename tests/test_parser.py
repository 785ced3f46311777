"""Parser/lexer unit tests (no Spark needed)."""

import pytest

from graphlite_spark.gql import ast as A
from graphlite_spark.gql.lexer import LexError, tokenize
from graphlite_spark.gql.parser import ParseError, parse


def test_tokenize_basics():
    toks = tokenize("MATCH (n:Label) WHERE n.x >= 1.5 RETURN n // done")
    kinds = [t.kind for t in toks]
    assert kinds[-1] == "EOF"
    assert "KEYWORD" in kinds and "NUMBER" in kinds
    assert not any(t.kind == "LINE_COMMENT" for t in toks)


def test_string_escapes():
    toks = tokenize("RETURN 'it''s', 'a\\nb', \"dq\"")
    strs = [t.value for t in toks if t.kind == "STRING"]
    assert strs == ["it's", "a\nb", "dq"]


def test_keyword_case_insensitive_and_original_text():
    toks = tokenize("match (o:Order)")
    assert toks[0].value == "MATCH"
    order_tok = [t for t in toks if t.value == "ORDER"][0]
    assert order_tok.text == "Order"  # label position keeps source casing


def test_lex_error_position():
    with pytest.raises(LexError):
        tokenize("MATCH (n) RETURN n @")


def test_parse_simple_match():
    q = parse("MATCH (a:L)-[e:T]->(b) WHERE a.x = 1 RETURN a.x AS x LIMIT 3")
    m, r = q.clauses
    assert isinstance(m, A.MatchClause) and not m.optional
    pat = m.patterns[0]
    assert [type(el).__name__ for el in pat.elements] == [
        "NodePattern", "EdgePattern", "NodePattern",
    ]
    assert pat.elements[1].direction == "out"
    assert r.limit == 3 and r.items[0].alias == "x"


def test_parse_directions():
    for text, d in [("-[:T]->", "out"), ("<-[:T]-", "in"), ("-[:T]-", "both")]:
        q = parse(f"MATCH (a){text}(b) RETURN count(*) AS n")
        assert q.clauses[0].patterns[0].elements[1].direction == d
    q = parse("MATCH (a)-->(b) RETURN count(*) AS n")
    assert q.clauses[0].patterns[0].elements[1].direction == "out"
    q = parse("MATCH (a)<->(b) RETURN count(*) AS n")
    assert q.clauses[0].patterns[0].elements[1].direction == "both"


def test_parse_quantifiers():
    q = parse("MATCH (a)-[:T]{2,4}->(b) RETURN count(*) AS n")
    assert q.clauses[0].patterns[0].elements[1].quant == (2, 4)
    q = parse("MATCH (a)-[:T]{3}->(b) RETURN count(*) AS n")
    assert q.clauses[0].patterns[0].elements[1].quant == (3, 3)
    q = parse("MATCH (a)-[:T*1..5]->(b) RETURN count(*) AS n")
    assert q.clauses[0].patterns[0].elements[1].quant == (1, 5)
    q = parse("MATCH (a)-[:T {w: 1}]->(b) RETURN count(*) AS n")
    ep = q.clauses[0].patterns[0].elements[1]
    assert ep.quant is None and "w" in ep.props


def test_parse_expression_precedence():
    q = parse("RETURN 1 + 2 * 3 ^ 2 AS x")
    e = q.clauses[0].items[0].expr
    # 1 + (2 * (3 ^ 2))
    assert e.op == "+" and e.right.op == "*" and e.right.right.op == "^"


def test_parse_case_cast_exists():
    q = parse(
        "MATCH (a:L) WHERE EXISTS {(a)-[:T]->(b:M)} "
        "RETURN CASE WHEN a.x > 1 THEN CAST(a.y AS BIGINT) ELSE 0 END AS v"
    )
    w = q.clauses[0].where
    assert isinstance(w, A.ExistsSubquery)
    item = q.clauses[0 + 1].items[0].expr
    assert isinstance(item, A.Case)


def test_parse_set_ops_chain():
    q = parse("MATCH (a:L) RETURN a.x AS x UNION ALL MATCH (b:M) RETURN b.x AS x "
              "EXCEPT MATCH (c:N) RETURN c.x AS x")
    assert isinstance(q, A.SetOp) and q.op == "EXCEPT"
    assert isinstance(q.left, A.SetOp) and q.left.op == "UNION" and q.left.all


def test_parse_with_pipeline():
    q = parse(
        "MATCH (a:L) WITH a.x AS x, count(*) AS c WHERE c > 2 "
        "ORDER BY c DESC LIMIT 5 UNWIND [1,2] AS u RETURN x AS x, u AS u"
    )
    kinds = [type(c).__name__ for c in q.clauses]
    assert kinds == ["MatchClause", "WithClause", "UnwindClause", "ReturnClause"]
    w = q.clauses[1]
    assert w.limit == 5 and w.where is not None and w.order_by[0].asc is False


def test_parse_errors():
    for bad in [
        "MATCH (a RETURN a",
        "RETURN",
        "MATCH (a:L) RETURN a.x AS",
        "MATCH (a)-[>(b) RETURN 1 AS x",
    ]:
        with pytest.raises(ParseError):
            parse(bad)


def test_parse_path_constructor():
    # PATH [n, e, n] literal (reference ast.rs:1227-1231)
    q = parse("MATCH (a:L)-[e:T]->(b:M) "
              "RETURN PATH [ID(a), ID(e), ID(b)] AS p, PATH [] AS empty")
    items = q.clauses[-1].items
    p = items[0].expr
    assert isinstance(p, A.PathLit) and len(p.items) == 3
    assert isinstance(p.items[0], A.FuncCall) and p.items[0].name == "ID"
    empty = items[1].expr
    assert isinstance(empty, A.PathLit) and empty.items == []
    # bare SHORTEST PATH keyword use must still parse (no regression)
    parse("MATCH SHORTEST PATH (a:L)-[:T]{1,3}->(b:M) RETURN count(*) AS n")


def test_parse_is_predicates_and_between():
    q = parse("MATCH (a:L) WHERE a.x IS NOT NULL AND a.y BETWEEN 1 AND 5 "
              "RETURN a.x AS x")
    w = q.clauses[0].where
    assert isinstance(w, A.Binary) and w.op == "AND"
    assert isinstance(w.left.left if isinstance(w.left, A.Binary) else w.left, (A.IsPredicate, A.Binary))


def test_parse_optional_and_params():
    q = parse("MATCH (a:L) OPTIONAL MATCH (a)-[:T]->(b:M) "
              "WHERE b.x IN $xs RETURN b.x AS x")
    assert q.clauses[1].optional


def test_parse_extended_is_predicates():
    q = parse(
        "MATCH (a:L)-[e:T]->(b:M) WHERE a IS SOURCE OF e "
        "AND b IS NOT DESTINATION OF e AND e IS DIRECTED "
        "AND a.s IS NORMALIZED AND a.x IS TYPED INTEGER "
        "AND a IS :L|M AND b IS NOT :X RETURN count(*) AS n")
    w = q.clauses[0].where
    found = []

    def walk(e):
        if isinstance(e, A.IsPredicate):
            found.append(e)
        if isinstance(e, A.Binary):
            walk(e.left)
            walk(e.right)

    walk(w)
    whats = sorted(p.what for p in found)
    assert whats == ["DESTINATION", "DIRECTED", "LABEL", "LABEL",
                     "NORMALIZED", "SOURCE", "TYPED"]
    by = {p.what: p for p in found}
    assert by["SOURCE"].target is not None
    assert by["TYPED"].type_name == "INTEGER"
    lbls = sorted(tuple(p.labels) for p in found if p.what == "LABEL")
    assert lbls == [("L", "M"), ("X",)]
    assert by["DESTINATION"].negated


def test_parser_error_contract_fuzz():
    """Any input either parses or raises ParseError (LexError included
    via subclassing) — never a bare ValueError/IndexError. Mirrors the
    reference's unified GraphLiteError::ParseError surface."""
    import random
    import string

    from graphlite_spark.gql import statements as S
    from graphlite_spark.gql.lexer import LexError
    from graphlite_spark.gql.parser import ParseError

    assert issubclass(LexError, ParseError)
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + " (){}[]<>-=.,:;'\"$*+/\\|@#%^&!?\n\t"
    bases = [
        "MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE c.c_acctbal > 100 "
        "RETURN c.c_name AS n ORDER BY n LIMIT 5",
        "MATCH (a:E)-[:F]{1,3}->(b:E) RETURN count(*) AS n",
        "INSERT (:Person {name: 'x', age: 3})",
        "SESSION SET GRAPH /default/g",
    ]
    for i in range(800):
        if i % 2:
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60)))
        else:
            chars = list(rng.choice(bases))
            for _ in range(rng.randint(1, 5)):
                pos = rng.randrange(len(chars))
                op = rng.random()
                if op < 0.4:
                    chars[pos] = rng.choice(alphabet)
                elif op < 0.7:
                    del chars[pos]
                else:
                    chars.insert(pos, rng.choice(alphabet))
            s = "".join(chars)
        try:
            S.parse_statement(s)
        except ParseError:
            pass
    # explicit regressions: non-integer LIMIT/SKIP/quantifier
    import pytest as _p

    for bad in ("MATCH (n:V) RETURN n.x AS x LIMIT 1.5",
                "MATCH (n:V) RETURN n.x AS x LIMIT foo",
                "MATCH (n:V) RETURN n.x AS x SKIP (",
                "MATCH (a:V)-[:E]{1.5}->(b:V) RETURN 1 AS x"):
        with _p.raises(ParseError):
            S.parse_statement(bad)
