"""One-shot CLI + minimal REPL, mirroring the reference's two interface
modes (reference docs/Architecture.md:116-363: `graphlite query` one-shot
with table/JSON/CSV formatting + --ast/--explain; `graphlite gql` REPL
with ';'-terminated multi-line queries).

    python -m graphlite_spark "MATCH (n:Nation) RETURN n.n_name AS name" \
        --data /root/testdata/sf0.001 --format json

With no query argument, drops into the REPL loop (one query per ';').
DDL/DML status results print as one JSON object; query results format
per --format.
"""

from __future__ import annotations

import argparse
import json
import sys


def _fmt_value(v):
    import datetime
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return [_fmt_value(x) for x in v]
    if hasattr(v, "asDict"):
        return {k: _fmt_value(x) for k, x in v.asDict().items()}
    return v


def format_rows(cols: list[str], rows: list, fmt: str) -> str:
    """Render collected rows as table / json / csv (output.rs
    ResultFormatter equivalents)."""
    if fmt == "json":
        return json.dumps(
            {"rows": [dict(zip(cols, [_fmt_value(v) for v in r])) for r in rows]}
        )
    if fmt == "csv":
        import csv
        import io

        buf = io.StringIO()
        w = csv.writer(buf, lineterminator="\n")
        w.writerow(cols)
        for r in rows:
            w.writerow(["" if v is None else _fmt_value(v) for v in r])
        return buf.getvalue().rstrip("\n")
    # table (reference REPL box-drawing style)
    cells = [[("NULL" if v is None else str(_fmt_value(v))) for v in r] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    top = "┌" + "┬".join("─" * (w + 2) for w in widths) + "┐"
    hdr = "│" + "│".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "│"
    sep = "╞" + "╪".join("═" * (w + 2) for w in widths) + "╡"
    bot = "└" + "┴".join("─" * (w + 2) for w in widths) + "┘"
    body = [
        "│" + "│".join(f" {v:<{w}} " for v, w in zip(row, widths)) + "│"
        for row in cells
    ]
    return "\n".join([top, hdr, sep, *body, bot])


def _build_db(args):
    from graphlite_spark import GraphLiteSpark
    from graphlite_spark.session import get_spark

    spark = get_spark(app_name="graphlite-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    db = GraphLiteSpark(spark, catalog_root=args.path)
    if args.data:
        from graphlite_spark.datasets.tpch import tpch_graph

        db.register_graph(tpch_graph(spark, args.data))
    if args.graph:
        db.execute(f"SESSION SET GRAPH {args.graph}")
    return db


def run_one(db, text: str, args, out=None) -> int:
    out = out or sys.stdout
    from pyspark.sql import DataFrame

    if args.ast:
        from graphlite_spark.gql.parser import parse

        print(parse(text), file=out)
        return 0
    res = db.execute(text)
    if isinstance(res, DataFrame):
        if args.explain:
            print(res._jdf.queryExecution().toString(), file=out)
            return 0
        if args.limit:
            # fetch cap+1 so a hit is detectable without a count job
            rows = res.limit(args.limit + 1).collect()
            if len(rows) > args.limit:
                rows = rows[: args.limit]
                print(
                    f"note: output truncated at {args.limit} rows "
                    "(use --limit 0 for no cap)",
                    file=sys.stderr,
                )
        else:
            rows = res.collect()
        print(format_rows(res.columns, rows, args.format), file=out)
    else:
        print(json.dumps(_fmt_value(res)), file=out)
    return 0


def repl(db, args) -> int:
    print("graphlite-spark")
    print("Type 'exit' to quit. Multi-line queries supported - use ';' to terminate")
    buf: list[str] = []
    while True:
        try:
            line = input("gql> " if not buf else "...> ")
        except EOFError:
            break
        if not buf and line.strip().lower() in ("exit", "quit"):
            break
        if not buf and line.strip().lower() == "help":
            print("enter GQL terminated by ';'; exit | quit | help")
            continue
        buf.append(line)
        joined = "\n".join(buf)
        if joined.rstrip().endswith(";"):
            buf = []
            try:
                run_one(db, joined.rstrip().rstrip(";"), args)
            except Exception as ex:  # noqa: BLE001 — REPL must survive errors
                print(f"error: {type(ex).__name__}: {ex}")
    print("Goodbye!")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m graphlite_spark",
        description="GraphLite-Spark one-shot query CLI / REPL",
    )
    p.add_argument("query", nargs="?", help="GQL text (omit for REPL mode)")
    p.add_argument("--format", choices=["table", "json", "csv"], default="table")
    p.add_argument("--path", default=None, help="catalog/warehouse root directory")
    p.add_argument("--data", default=None,
                   help="parquet dir to register as the TPC-H-shaped graph")
    p.add_argument("--graph", default=None, help="SESSION SET GRAPH target")
    p.add_argument("--ast", action="store_true", help="print the parsed AST and exit")
    p.add_argument("--explain", action="store_true",
                   help="print the execution plan instead of rows")
    p.add_argument("--limit", type=int, default=1000,
                   help="cap rows collected to the driver "
                        "(default 1000; 0 = no cap)")
    args = p.parse_args(argv)

    db = _build_db(args)
    if args.query is None:
        return repl(db, args)
    return run_one(db, args.query, args)


if __name__ == "__main__":
    sys.exit(main())
