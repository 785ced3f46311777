"""Property-based expression-compiler testing (hypothesis).

Random predicate trees over the customer table are rendered twice —
once as GQL WHERE (engine path) and once as ANSI SQL (DuckDB) — and the
matching row counts must agree. The reference has no property-based
tests (SURVEY §5 'Absent'); this goes beyond its strategy.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"

# (gql_rendering, sql_rendering) atom pairs over customer columns
_NUM_COLS = [("c.c_custkey", "c_custkey"), ("c.c_nationkey", "c_nationkey"),
             ("c.c_acctbal", "c_acctbal")]
_STR_COLS = [("c.c_name", "c_name"), ("c.c_mktsegment", "c_mktsegment")]
_SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE", "nope"]


def _num_atom():
    return st.one_of(
        st.sampled_from(_NUM_COLS),
        st.integers(min_value=-50, max_value=5000).map(lambda v: (str(v), str(v))),
    )


@st.composite
def _numeric_expr(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(_num_atom())
    op = draw(st.sampled_from(["+", "-", "*"]))
    lg, ls = draw(_numeric_expr(depth=depth - 1))
    rg, rs = draw(_numeric_expr(depth=0))  # keep magnitudes bounded
    return (f"({lg} {op} {rg})", f"({ls} {op} {rs})")


@st.composite
def _predicate(draw, depth=2):
    kind = draw(st.sampled_from(
        ["cmp", "cmp", "cmp", "strcmp", "in", "like", "null", "bool"]
        if depth > 0 else ["cmp", "strcmp", "in", "like", "null"]
    ))
    if kind == "cmp":
        op = draw(st.sampled_from(["=", "<>", "<", "<=", ">", ">="]))
        lg, ls = draw(_numeric_expr())
        rg, rs = draw(_numeric_expr())
        return (f"{lg} {op} {rg}", f"{ls} {op} {rs}")
    if kind == "strcmp":
        col_g, col_s = draw(st.sampled_from(_STR_COLS))
        seg = draw(st.sampled_from(_SEGMENTS))
        op = draw(st.sampled_from(["=", "<>", "<", ">"]))
        return (f"{col_g} {op} '{seg}'", f"{col_s} {op} '{seg}'")
    if kind == "in":
        col_g, col_s = draw(st.sampled_from(_NUM_COLS[:2]))
        vals = draw(st.lists(st.integers(0, 30), min_size=1, max_size=4))
        return (
            f"{col_g} IN [{', '.join(map(str, vals))}]",
            f"{col_s} IN ({', '.join(map(str, vals))})",
        )
    if kind == "like":
        col_g, col_s = draw(st.sampled_from(_STR_COLS))
        pat = draw(st.sampled_from(["Customer%", "%42", "%er#0000%", "_ustomer%", "zzz%"]))
        return (f"{col_g} LIKE '{pat}'", f"{col_s} LIKE '{pat}'")
    if kind == "null":
        col_g, col_s = draw(st.sampled_from(_NUM_COLS + _STR_COLS))
        neg = draw(st.booleans())
        n = "NOT " if neg else ""
        return (f"{col_g} IS {n}NULL", f"{col_s} IS {n}NULL")
    # bool combinator
    comb = draw(st.sampled_from(["AND", "OR"]))
    lg, ls = draw(_predicate(depth=depth - 1))
    rg, rs = draw(_predicate(depth=depth - 1))
    if draw(st.booleans()):
        return (f"NOT ({lg} {comb} {rg})", f"NOT ({ls} {comb} {rs})")
    return (f"({lg}) {comb} ({rg})", f"({ls}) {comb} ({rs})")


@pytest.fixture(scope="module")
def engine(spark):
    from graphlite_spark import GraphLiteSpark
    from graphlite_spark.datasets.tpch import tpch_graph

    db = GraphLiteSpark(spark)
    db.register_graph(tpch_graph(spark, SF_DIR))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'")
    return db, con


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=_predicate())
def test_predicate_parity(engine, pred):
    db, con = engine
    gql_pred, sql_pred = pred
    got = db.query(
        f"MATCH (c:Customer) WHERE {gql_pred} RETURN count(*) AS n"
    ).collect()[0].n
    want = con.execute(f"SELECT count(*) FROM customer WHERE {sql_pred}").fetchone()[0]
    assert got == want, f"GQL [{gql_pred}] -> {got}, SQL [{sql_pred}] -> {want}"


def test_type_function_on_values(simple_db):
    # graph_functions.rs:208-224 value-type names; runtime NULL -> "NULL"
    got = [tuple(r) for r in simple_db.query(
        "MATCH (n:TestNode {id: 1}) RETURN TYPE(n.name) AS t_str, "
        "TYPE(n.value) AS t_num, TYPE(n.value > 1) AS t_bool, "
        "TYPE(n.nope) AS t_null, TYPE([1, 2]) AS t_list").collect()]
    assert got == [("STRING", "NUMBER", "BOOLEAN", "NULL", "LIST")]


def test_type_function_through_with(simple_db):
    got = [tuple(r) for r in simple_db.query(
        "MATCH (n:TestNode {id: 1}) WITH n.name AS s, n.value AS v "
        "RETURN TYPE(s) AS ts, TYPE(v) AS tv").collect()]
    assert got == [("STRING", "NUMBER")]
