"""One-shot CLI (python -m graphlite_spark) — reference
docs/Architecture.md:116-363: table/JSON/CSV formatting, --ast, DDL
status output. Driven in-process via main(argv) so the suite's Spark
session is reused (get_spark getOrCreate)."""

from __future__ import annotations

import json

from graphlite_spark.__main__ import format_rows, main

DATA = "/root/testdata/sf0.001"
Q = "MATCH (r:Region) RETURN r.r_name AS name ORDER BY name LIMIT 2"


def test_format_rows_shapes():
    cols = ["a", "b"]
    rows = [(1, "x"), (None, "yy")]
    t = format_rows(cols, rows, "table")
    assert "│ a" in t and "NULL" in t and t.count("\n") == 5
    j = json.loads(format_rows(cols, rows, "json"))
    assert j == {"rows": [{"a": 1, "b": "x"}, {"a": None, "b": "yy"}]}
    c = format_rows(cols, rows, "csv")
    assert c.splitlines() == ["a,b", "1,x", ",yy"]


def test_cli_one_shot_formats(spark, capsys):
    for fmt, probe in [("table", "│ AFRICA"), ("json", '"name": "AFRICA"'),
                       ("csv", "AFRICA")]:
        assert main([Q, "--data", DATA, "--format", fmt]) == 0
        out = capsys.readouterr().out
        assert probe in out and "AMERICA" in out


def test_cli_default_collect_cap(spark, capsys):
    # driver-safety: an un-LIMITed query collects at most the default
    # --limit 1000 rows; --limit 0 is the explicit no-cap escape hatch
    q = "MATCH (o:Order) RETURN o.o_orderkey AS k"
    assert main([q, "--data", DATA, "--format", "csv"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 1 + 1000
    assert main([q, "--data", DATA, "--format", "csv", "--limit", "0"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) > 1 + 1000


def test_cli_ast_and_status(spark, capsys):
    assert main([Q, "--data", DATA, "--ast"]) == 0
    assert "MatchClause" in capsys.readouterr().out
    # DDL returns a status dict rendered as one JSON object
    assert main(["CREATE SCHEMA /cli_smoke", "--data", DATA]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st.get("status") == "ok"
