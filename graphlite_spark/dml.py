"""DML execution: INSERT / MATCH-SET / MATCH-REMOVE / MATCH-DELETE.

Spark-first rendition of the reference write engine (GraphLite
`graphlite/src/exec/write_engine/operations/{insert,match_set,
match_delete,match_remove}.rs`): mutations compile to joins against the
matched-id set and produce NEW node/edge DataFrames (copy-on-write),
which is also what makes transactions cheap — START TRANSACTION simply
snapshots the table dict, ROLLBACK restores it (optimistic, last-writer
-wins; the reference's interactive isolation levels don't map 1:1 and
this divergence is documented in README).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from .catalog import content_hash_id
from .graph import DST, ID, SRC, PropertyGraph
from .gql import ast as A
from .gql.compiler import CompileError, ExprCompiler, QueryCompiler, _ncol
from .gql.statements import InsertStmt, MatchMutateStmt


class DmlError(ValueError):
    pass


def _literal_props(props: dict[str, A.Expr], params: dict,
                   spark=None) -> dict[str, Any]:
    """Evaluate INSERT/SET property values: literals and parameters
    directly; any other *constant* expression (function calls, arithmetic
    — function_expression_insert_test.rs allows e.g. upper('x'),
    abs(-5)) through the expression compiler over a single row. Variable
    references are rejected (nothing is bound in INSERT patterns)."""
    out = {}
    pending: dict[str, A.Expr] = {}
    for k, v in props.items():
        if isinstance(v, A.Literal):
            out[k] = v.value
        elif isinstance(v, A.Param):
            out[k] = params.get(v.name)
        elif isinstance(v, A.Unary) and v.op == "-" and isinstance(v.operand, A.Literal):
            out[k] = -v.operand.value
        elif spark is not None:
            pending[k] = v
        else:
            raise DmlError("INSERT property values must be literals or parameters")
    if pending:
        from .gql.compiler import Frame

        frame = Frame(spark.range(1))
        cols = []
        for k, v in pending.items():
            try:
                cols.append(ExprCompiler(frame, params).compile(v).alias(k))
            except CompileError as e:
                raise DmlError(
                    f"INSERT property {k!r} must be a constant expression: {e}"
                ) from e
        row = frame.df.select(*cols).collect()[0]
        for k in pending:
            out[k] = row[k]
    return out


def execute_insert(graph: PropertyGraph, stmt: InsertStmt,
                   params: dict | None = None,
                   warnings: list | None = None) -> int:
    """INSERT node/edge patterns. Entity ids are content hashes of
    labels+props (insert.rs:87-135 recipe), which makes identical-content
    inserts idempotent: a duplicate node/edge is skipped with a warning
    and rows_affected 0, the behavior pinned by the reference's
    duplicate_insert_test.rs / duplicate_edge_warning_test.rs. Appends
    build new DataFrames (unionByName with missing-column fill) — at
    scale these become Delta appends; here copy-on-write frames."""
    params = params or {}
    spark = graph.spark
    n_affected = 0
    gt = graph.graph_type
    for pat in stmt.patterns:
        elems = pat.elements
        node_ids: list[str] = []
        node_labels: list[str] = []
        # nodes first
        for el in elems[::2]:
            if not el.labels:
                raise DmlError("INSERT node needs a label")
            label = el.labels[0]
            props = _literal_props(el.props, params, graph.spark)
            if gt is not None:
                gt.validate_node(el.labels, props)
            nid = content_hash_id(el.labels, props)
            if label in graph.nodes:
                nid = _fit_id(graph.nodes[label], nid)
            node_ids.append(nid)
            node_labels.append(label)
            row = {"_id": nid, **props}
            if label in graph.nodes:
                old = graph.nodes[label]
                if old.filter(
                    F.col("_id") == F.lit(nid)
                ).limit(1).count() > 0:
                    if warnings is not None:
                        warnings.append(
                            f"Duplicate node detected (content hash {nid}); "
                            "insert skipped"
                        )
                    continue
                graph.nodes[label] = _union_fill(old, spark.createDataFrame([row]))
            else:
                graph.add_nodes(label, spark.createDataFrame([row]), "_id")
            n_affected += 1
        # then edges
        for i, el in enumerate(elems[1::2]):
            etype = el.types[0] if el.types else None
            if etype is None:
                raise DmlError("INSERT edge needs a type")
            props = _literal_props(el.props, params, graph.spark)
            src_i, dst_i = (i, i + 1) if el.direction != "in" else (i + 1, i)
            if gt is not None:
                gt.validate_edge(
                    etype, node_labels[src_i], node_labels[dst_i], props
                )
            row = {"_src": node_ids[src_i], "_dst": node_ids[dst_i], **props}
            if etype in graph.edges:
                et = graph.edges[etype]
                if _row_exists(et.df, row):
                    if warnings is not None:
                        warnings.append(
                            f"Duplicate edge detected "
                            f"({node_ids[src_i]})-[:{etype}]->"
                            f"({node_ids[dst_i]}); insert skipped"
                        )
                    continue
                et.df = _union_fill(et.df, spark.createDataFrame([row]))
            else:
                graph.add_edges(
                    etype, spark.createDataFrame([row]), "_src", "_dst",
                    node_labels[src_i], node_labels[dst_i],
                )
            n_affected += 1
    return n_affected


def _fit_id(existing_df, nid: str):
    """Fit a content-hash id to the target table's _id type: tables
    registered with a natural numeric key (graphs built from parquet
    facts) get the hash folded into a positive long (first 60 bits) so
    the id column stays one type — appending a string hash to a long
    column is a latent ANSI cast failure at first execution."""
    if dict(existing_df.dtypes).get("_id") == "string":
        return nid
    return int(nid[:15], 16)


def _row_exists(df, row: dict) -> bool:
    """Content-equality probe: a stored row matches iff every column
    null-safe-equals the inserted value (columns absent from the insert
    must be NULL — extra non-null props make a different edge). A value
    whose Python type can't live in the column's Spark type (string hash
    vs long endpoint column) means no duplicate is possible — comparing
    would be an ANSI cast error, not a match."""
    from pyspark.sql.types import BooleanType, NumericType, StringType

    # An insert carrying a property column the table has never seen can't
    # equal any stored row — its content hash differs even if every shared
    # column matches (value.rs content identity covers all properties).
    if set(row) - set(df.columns):
        return False

    types = {f.name: f.dataType for f in df.schema.fields}
    cond = None
    for c in df.columns:
        v = row.get(c)
        if v is None:
            cc = F.col(c).isNull()
        else:
            dt = types[c]
            ok = (
                isinstance(dt, StringType) if isinstance(v, str)
                else isinstance(dt, BooleanType) if isinstance(v, bool)
                else isinstance(dt, NumericType) if isinstance(v, (int, float))
                else True
            )
            if not ok:
                return False
            cc = F.col(c).eqNullSafe(F.lit(v))
        cond = cc if cond is None else cond & cc
    return df.filter(cond).limit(1).count() > 0


def _union_fill(old, new):
    """unionByName with schema union (new props become NULL on old rows),
    LINEAGE-CUT: without the cut, n sequential mutations build an
    n-deep union whose branches are the MUTATIONS' OWN PLANS (a
    MATCH-INSERT appends its join subtree), so every later statement
    re-executes all prior mutations and the non-CBO join-stats product
    compounds per level — measured 11 single-edge inserts taking 430s
    (~40s each, growing) before the cut, sub-second after. DML frames
    are small by nature, so the eager checkpoint costs milliseconds
    and keeps every mutation O(current data), not O(history)."""
    from .operators.paths import _ck_cut_stats

    return _ck_cut_stats(old.unionByName(new, allowMissingColumns=True))


def _compile_matches(graph: PropertyGraph, matches, params):
    qc = QueryCompiler(graph, params)
    qc._referenced = {"*"}  # mutations touch entities: no join elision
    frame = None
    for m in matches:
        frame = qc._compile_match(frame, m)
    if frame is None:
        raise DmlError("mutation requires a MATCH")
    return qc, frame


def execute_mutate(graph: PropertyGraph, stmt: MatchMutateStmt,
                   params: dict | None = None) -> int:
    params = params or {}
    qc, frame = _compile_matches(graph, stmt.matches, params)

    if stmt.action == "SET":
        total = 0
        for item in stmt.set_items:
            total += _apply_set(graph, frame, item, params)
        return total
    if stmt.action == "REMOVE":
        total = 0
        for var, prop in stmt.remove_items:
            total += _apply_remove(graph, frame, var, prop)
        return total
    if stmt.action in ("DELETE", "DETACH_DELETE"):
        total = 0
        for var in stmt.delete_vars:
            total += _apply_delete(graph, frame, var, detach=stmt.action == "DETACH_DELETE")
        return total
    if stmt.action == "INSERT":
        return _apply_match_insert(graph, frame, stmt.insert_patterns, params)
    raise DmlError(f"unknown action {stmt.action}")


def _apply_match_insert(graph: PropertyGraph, frame, patterns, params) -> int:
    """MATCH ... INSERT (a)-[:T {..}]->(b): connect matched nodes
    (match_insert.rs). Node elements must be bound match variables or
    literal-only new nodes; edges append per distinct endpoint pair."""
    total = 0
    for pat in patterns:
        elems = pat.elements
        id_exprs = []
        labels = []
        for el in elems[::2]:
            if el.var and el.var in frame.bindings:
                b = frame.bindings[el.var]
                if b.kind != "node" or b.label is None:
                    raise DmlError(f"{el.var!r} is not a labeled node variable")
                id_exprs.append(F.col(_ncol(el.var, ID)))
                labels.append(b.label)
            else:
                if not el.labels:
                    raise DmlError("INSERT node needs a label or bound variable")
                props = _literal_props(el.props, params, graph.spark)
                nid = content_hash_id(el.labels, props)
                label = el.labels[0]
                if label in graph.nodes:
                    nid = _fit_id(graph.nodes[label], nid)
                row = {"_id": nid, **props}
                new_df = graph.spark.createDataFrame([row])
                if label in graph.nodes:
                    graph.nodes[label] = _union_fill(graph.nodes[label], new_df)
                else:
                    graph.add_nodes(label, new_df, "_id")
                id_exprs.append(F.lit(nid))
                labels.append(label)
                total += 1
        for i, el in enumerate(elems[1::2]):
            if not el.types:
                raise DmlError("INSERT edge needs a type")
            etype = el.types[0]
            props = _literal_props(el.props, params, graph.spark)
            src_i, dst_i = (i, i + 1) if el.direction != "in" else (i + 1, i)
            new_edges = frame.df.select(
                id_exprs[src_i].alias(SRC),
                id_exprs[dst_i].alias(DST),
                *[F.lit(v).alias(k) for k, v in props.items()],
            ).dropDuplicates([SRC, DST])
            total += new_edges.count()
            if etype in graph.edges:
                et = graph.edges[etype]
                et.df = _union_fill(et.df, new_edges)
            else:
                graph.add_edges(
                    etype, new_edges, SRC, DST, labels[src_i], labels[dst_i]
                )
    return total


def _binding(frame, var):
    b = frame.bindings.get(var)
    if b is None:
        raise DmlError(f"unbound variable {var!r}")
    return b


def _apply_set(graph: PropertyGraph, frame, item, params) -> int:
    b = _binding(frame, item.var)
    if b.kind != "node":
        raise DmlError("SET supports node properties (edge SET: planned)")
    if item.label is not None:
        raise DmlError("SET label is not supported yet")
    label = b.label
    if label is None:
        raise DmlError("SET target must have a known label")
    ec = ExprCompiler(frame, params)
    new_vals = (
        frame.df.select(
            F.col(_ncol(item.var, ID)).alias("__tid"),
            ec.compile(item.value).alias("__newval"),
        )
        .dropDuplicates(["__tid"])
    )
    nodes = graph.nodes[label]
    joined = nodes.join(new_vals, nodes[ID] == F.col("__tid"), "left")
    if item.prop in nodes.columns:
        updated = joined.withColumn(
            item.prop,
            F.when(F.col("__tid").isNotNull(), F.col("__newval")).otherwise(
                F.col(item.prop)
            ),
        )
    else:
        updated = joined.withColumn(
            item.prop,
            F.when(F.col("__tid").isNotNull(), F.col("__newval")),
        )
    graph.nodes[label] = updated.drop("__tid", "__newval")
    return new_vals.count()


def _apply_remove(graph: PropertyGraph, frame, var, prop) -> int:
    b = _binding(frame, var)
    if b.kind != "node" or b.label is None:
        raise DmlError("REMOVE supports labeled node properties")
    nodes = graph.nodes[b.label]
    if prop not in nodes.columns:
        return 0
    ids = frame.df.select(F.col(_ncol(var, ID)).alias("__tid")).distinct()
    joined = nodes.join(ids, nodes[ID] == F.col("__tid"), "left")
    updated = joined.withColumn(
        prop, F.when(F.col("__tid").isNotNull(), F.lit(None)).otherwise(F.col(prop))
    )
    graph.nodes[b.label] = updated.drop("__tid")
    return ids.count()


def _apply_delete(graph: PropertyGraph, frame, var, detach: bool) -> int:
    b = _binding(frame, var)
    if b.kind == "edge":
        # delete matched edges of this type by (src,dst) pair
        if b.label is None:
            raise DmlError("DELETE edge requires a single edge type")
        et = graph.edges[b.label]
        pairs = frame.df.select(
            F.col(_ncol(var, SRC)).alias("__s"), F.col(_ncol(var, DST)).alias("__d")
        ).distinct()
        n = pairs.count()
        et.df = et.df.join(
            pairs, (et.df[SRC] == F.col("__s")) & (et.df[DST] == F.col("__d")),
            "left_anti",
        )
        return n
    if b.label is None:
        raise DmlError("DELETE target must have a known label")
    ids = frame.df.select(F.col(_ncol(var, ID)).alias("__tid")).distinct()
    n = ids.count()
    label = b.label
    incident = []
    for ename, et in graph.edges.items():
        if et.src_label == label or et.dst_label == label:
            cond_cols = []
            if et.src_label == label:
                cond_cols.append(SRC)
            if et.dst_label == label:
                cond_cols.append(DST)
            for c in cond_cols:
                cnt = et.df.join(ids, et.df[c] == F.col("__tid"), "left_semi")
                if not cnt.isEmpty():
                    incident.append((ename, c))
    if incident and not detach:
        raise DmlError(
            f"cannot DELETE {var}: incident edges exist "
            f"({sorted(set(e for e, _ in incident))}); use DETACH DELETE"
        )
    for ename, c in incident:
        et = graph.edges[ename]
        et.df = et.df.join(ids, et.df[c] == F.col("__tid"), "left_anti")
    nodes = graph.nodes[label]
    graph.nodes[label] = nodes.join(ids, nodes[ID] == F.col("__tid"), "left_anti")
    return n
