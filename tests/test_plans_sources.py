"""Plan-quality assertions + source readers."""

from __future__ import annotations


def test_q1_plan_is_single_pruned_scan(spark):
    """The elision + pushdown contract: an edge-only aggregation reads one
    table, prunes to the referenced columns, pushes the filter."""
    from graphlite_spark import GraphLiteSpark
    from graphlite_spark.datasets.tpch import tpch_graph
    from graphlite_spark.plans.inspect import summarize

    db = GraphLiteSpark(spark)
    db.register_graph(tpch_graph(spark, "/root/testdata/sf0.001"))
    df = db.query(
        "MATCH (o:Order)-[l:LINE]->(p:Part) WHERE l.l_quantity > 10 "
        "RETURN l.l_returnflag AS rf, count(*) AS n"
    )
    s = summarize(df)
    assert s.joins == 0, s.text
    li_scans = [x for x in s.scans if "lineitem" in (x["location"] or "")]
    assert len(li_scans) == 1
    assert any("l_quantity" in f for f in li_scans[0]["pushed_filters"]), li_scans
    assert len(li_scans[0]["columns"]) <= 2, li_scans


def test_expand_pushes_node_filter_to_scan(spark):
    from graphlite_spark import GraphLiteSpark
    from graphlite_spark.datasets.tpch import tpch_graph
    from graphlite_spark.plans.inspect import summarize

    db = GraphLiteSpark(spark)
    db.register_graph(tpch_graph(spark, "/root/testdata/sf0.001"))
    df = db.query(
        "MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE c.c_acctbal > 9000 "
        "RETURN c.c_custkey AS k, o.o_orderkey AS ok"
    )
    s = summarize(df)
    cust = [x for x in s.scans if "customer" in (x["location"] or "")]
    assert cust and any("c_acctbal" in f for f in cust[0]["pushed_filters"]), s.text


def test_key_derivation_elides_node_scan(spark):
    """A var referenced only via its natural key joins no node table: the
    key decodes from the edge endpoint id (graph.set_key_derivation)."""
    from graphlite_spark import GraphLiteSpark
    from graphlite_spark.datasets.tpch import tpch_graph
    from graphlite_spark.plans.inspect import summarize

    db = GraphLiteSpark(spark)
    db.register_graph(tpch_graph(spark, "/root/testdata/sf0.001"))
    # s only via s.s_suppkey -> the supplier NODE table must not be
    # scanned; the IN_NATION edge (built from supplier.parquet) reads
    # only the two endpoint-key columns
    df = db.query(
        "MATCH (s:Supplier)-[:IN_NATION]->(n:Nation) "
        "RETURN s.s_suppkey AS sk, n.n_name AS nation ORDER BY sk LIMIT 5"
    )
    s = summarize(df)
    # formatted plans list each join node twice (tree + detail section):
    # one physical join -> 2 matches. Only the Nation join remains.
    assert s.joins == 2, s.text
    sup = [x for x in s.scans if "supplier" in (x["location"] or "")]
    assert len(sup) == 1, s.text
    assert set(sup[0]["columns"]) <= {"s_suppkey", "s_nationkey"}, sup
    rows = df.collect()
    assert [r.sk for r in rows] == [0, 1, 2, 3, 4]
    # derived key keeps the source column type (int64 here)
    assert dict(df.dtypes)["sk"] == "bigint"


def test_key_derivation_entity_use_still_materializes(spark):
    """RETURN s (entity) must keep the node-table join — derivation only
    applies to key/_id property footprints."""
    from graphlite_spark import GraphLiteSpark
    from graphlite_spark.datasets.tpch import tpch_graph
    from graphlite_spark.plans.inspect import summarize

    db = GraphLiteSpark(spark)
    db.register_graph(tpch_graph(spark, "/root/testdata/sf0.001"))
    df = db.query(
        "MATCH (s:Supplier)-[:IN_NATION]->(n:Nation) "
        "WHERE n.n_name IS NOT NULL RETURN s.s_name AS name ORDER BY name LIMIT 3"
    )
    s = summarize(df)
    # two physical joins (supplier + nation), each listed twice
    assert s.joins == 4, s.text
    assert df.count() > 0


def test_interior_shared_var_avoids_rescan(spark):
    """A var shared mid-pattern splits the pattern at the bound node and
    expands both directions on the current frame — no second nation
    scan, no frame-to-frame join (_split_at_bound)."""
    from graphlite_spark import GraphLiteSpark
    from graphlite_spark.datasets.tpch import tpch_graph
    from graphlite_spark.plans.inspect import summarize

    db = GraphLiteSpark(spark)
    db.register_graph(tpch_graph(spark, "/root/testdata/sf0.001"))
    df = db.query(
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation), "
        "(s:Supplier)-[:IN_NATION]->(n)-[:IN_REGION]->(r:Region) "
        "RETURN r.r_name AS region, count(*) AS n_pairs ORDER BY region"
    )
    s = summarize(df)
    # n is structural: its node table is elided entirely; the single
    # nation.parquet scan is the IN_REGION edge table
    nation_scans = [x for x in s.scans if "nation" in (x["location"] or "")]
    assert len(nation_scans) == 1, s.text
    got = [(r.region, r.n_pairs) for r in df.collect()]
    assert got == [
        ("AFRICA", 14), ("AMERICA", 5), ("ASIA", 4),
        ("EUROPE", 21), ("MIDDLE EAST", 18),
    ]


def test_correlated_not_exists_is_single_anti_join(spark):
    """Decorrelation contract: a NOT EXISTS whose body references outer
    variables compiles to ONE anti-join with the correlated predicate as
    the join condition — no nested-loop join, no per-row re-execution."""
    from graphlite_spark import GraphLiteSpark
    from graphlite_spark.datasets.tpch import tpch_graph
    from graphlite_spark.plans.inspect import summarize

    db = GraphLiteSpark(spark)
    db.register_graph(tpch_graph(spark, "/root/testdata/sf0.001"))
    df = db.query(
        "MATCH (s:Supplier)-[l:SUPPLIES]->(:Part) "
        "WHERE NOT EXISTS {(s2:Supplier)-[l2:SUPPLIES]->(:Part) "
        "WHERE l2.l_orderkey = l.l_orderkey AND s2.s_suppkey <> s.s_suppkey} "
        "RETURN s.s_name AS s_name, count(*) AS n"
    )
    s = summarize(df)
    assert s.nested_loop_joins == 0, s.text
    assert "LeftAnti" in s.text, s.text
    # both pattern scans elide their part/supplier node tables: only the
    # lineitem edge table (and the supplier node for s_name) is read
    li = [x for x in s.scans if "lineitem" in (x["location"] or "")]
    assert len(li) == 2, s.text


def test_edge_list_reader(spark, tmp_path):
    from graphlite_spark.sources.readers import edge_list

    p = tmp_path / "edges.txt"
    p.write_text("# comment\n1\t2\n2\t3\n3\t1\n")
    df = edge_list(spark, str(p))
    assert sorted((r._src, r._dst) for r in df.collect()) == [(1, 2), (2, 3), (3, 1)]


def test_documents_source_jsonl(spark, tmp_path):
    from graphlite_spark.sources.readers import documents_source

    p = tmp_path / "docs.jsonl"
    p.write_text('{"body": "hello world"}\n{"body": "hello world"}\n{"body": "other"}\n')
    df = documents_source(spark, str(p), fmt="json", text_col="body")
    assert set(df.columns) >= {"doc_id", "text"}
    got = df.select("doc_id", "text").collect()
    ids = {r.text: r.doc_id for r in got}
    assert len(ids) == 2  # same text → same content-derived id


def test_load_nodes_edges_roundtrip(spark, tmp_path):
    from graphlite_spark import GraphLiteSpark, PropertyGraph
    from graphlite_spark.sources.readers import load_edges, load_nodes

    nodes_p = str(tmp_path / "n.parquet")
    edges_p = str(tmp_path / "e.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "nid: long, name: string"
    ).write.parquet(nodes_p)
    spark.createDataFrame(
        [(1, 2), (2, 3)], "s: long, d: long"
    ).write.parquet(edges_p)

    g = PropertyGraph(spark, name="g")
    load_nodes(g, "N", nodes_p, "nid")
    load_edges(g, "E", edges_p, "s", "d", "N", "N")
    db = GraphLiteSpark(spark)
    db.register_graph(g)
    got = db.query(
        "MATCH (a:N)-[:E]->(b:N) RETURN a.name AS a, b.name AS b ORDER BY a"
    ).collect()
    assert [(r.a, r.b) for r in got] == [("a", "b"), ("b", "c")]


def test_bucketed_expand_join_avoids_shuffle(spark):
    """The scale layout: node table bucketed by _id, edge table by _src,
    same bucket count — the expand join runs with at most one Exchange
    (the unbucketed probe side), not two."""
    from graphlite_spark import GraphLiteSpark, PropertyGraph
    from graphlite_spark.plans.inspect import summarize

    nodes = spark.createDataFrame(
        [(i, f"u{i}") for i in range(1000)], "uid: long, name: string"
    )
    edges = spark.createDataFrame(
        [(i, (i * 7) % 1000) for i in range(5000)], "src: long, dst: long"
    )
    g = PropertyGraph(spark, name="buck")
    g.add_nodes("U", nodes, "uid")
    g.add_edges("F", edges, "src", "dst", "U", "U")
    db = GraphLiteSpark(spark)
    db.register_graph(g)
    db.catalog.save_graph_bucketed("/default/buck", buckets=4)
    gb = db.catalog.load_graph_bucketed("/default/buck")
    db.register_graph(gb, "buck_b")

    df = db.query(
        "MATCH (a:U)-[:F]->(b:U) RETURN a.name AS an, b.name AS bn",
        graph="/default/buck_b",
    )
    s = summarize(df)
    # both joins hit bucketed tables on the bucket key; allow the AQE
    # top-level exchange but no full two-sided shuffle per join
    assert s.exchanges <= 2, s.text


def test_result_formats(spark):
    import json as _json

    from graphlite_spark.sources.sinks import format_rows, write_results

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, name: string")
    t = format_rows(df.orderBy("id"), "table")
    assert "| id" in t and "| 1" in t.replace("  ", " ")
    j = _json.loads(format_rows(df.orderBy("id"), "json"))
    assert j == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    c = format_rows(df.orderBy("id"), "csv")
    assert c.splitlines()[0] == "id,name" and "1,a" in c


def test_write_results_roundtrip(spark, tmp_path):
    from graphlite_spark.sources.sinks import write_results

    df = spark.createDataFrame([(1, "a")], "id: long, name: string")
    out = str(tmp_path / "res")
    write_results(df, out, fmt="parquet")
    assert spark.read.parquet(out).count() == 1


def test_write_parquet_sized(spark, tmp_path):
    import glob

    from graphlite_spark.sources.sinks import write_parquet_sized

    df = spark.range(0, 10000).selectExpr(
        "id", "id % 7 AS k", "repeat('x', 100) AS pad")
    out = str(tmp_path / "sized")
    n = write_parquet_sized(df, out, target_mb=1)
    files = glob.glob(out + "/*.parquet")
    assert len(files) == n >= 1
    back = spark.read.parquet(out)
    assert back.count() == 10000

    # hive partitioning + in-partition sort still round-trips
    out2 = str(tmp_path / "sized2")
    write_parquet_sized(df, out2, target_mb=1, partition_by=["k"],
                        sort_by=["id"])
    back2 = spark.read.parquet(out2)
    assert back2.count() == 10000
    assert set(back2.select("k").distinct().toPandas()["k"]) == set(range(7))

    import pytest

    with pytest.raises(ValueError):
        write_parquet_sized(df, out, target_mb=0)


def test_bloom_join_hash_chains_stay_below_the_bnlj(spark):
    """Pin the r8 codegen repair: the KM mix32 hash projections live
    on the PROBE branch below the BroadcastNestedLoopJoin, so
    bnlj_doConsume holds only the k bit tests and compiles inside
    janino's 64 KB method limit (the old shape fused the chains into
    the join consume and silently fell back to interpreted eval)."""
    from pyspark.sql import functions as F

    from graphlite_spark.operators.sketches import bloom_filter_join

    big = spark.range(2000).select(F.col("id").alias("k"))
    keys = spark.range(0, 2000, 7).select(F.col("id").alias("k"))
    out = bloom_filter_join(big, keys, "k", num_bits=1 << 12, k=3)
    out.write.mode("overwrite").format("noop").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    bnlj_idx = next(i for i, ln in enumerate(lines)
                    if "BroadcastNestedLoopJoin" in ln)
    # in the physical tree string, children print BELOW their parent;
    # every _qp hash column must first materialize below the join
    qp_idx = next(i for i, ln in enumerate(lines)
                  if "_qp0" in ln and "Project" in ln)
    assert qp_idx > bnlj_idx, (
        "KM hash projection sits above the join again:\n" + plan[:2000])
    # and the answer is still the bloom superset semantics: every true
    # member survives (no false negatives)
    got = {r.k for r in out.collect()}
    assert {r.k for r in keys.collect()} <= got


def test_asof_delta_clamp_compiles_to_partition_filter(spark, tmp_path):
    """Time-travel reads prune later epochs at the DIRECTORY level:
    the snapshot's hwm clamp must appear as a PartitionFilters entry
    on the delta scan (a post-scan Filter would read epoch 2's files
    first)."""
    from graphlite_spark.operators.dedup import (
        build_dedup_index,
        dedup_index_ingest_batch,
    )
    from graphlite_spark.operators.index_store import read_tier

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(1, "alpha bravo common words here")],
        "doc_id long, text string")
    build_dedup_index(docs, path, n=3, num_hashes=64, bands=16)
    dedup_index_ingest_batch(spark.createDataFrame(
        [(10, "fresh epoch one content okay")],
        "doc_id long, text string"), path, batch_id=1, near=False)
    dedup_index_ingest_batch(spark.createDataFrame(
        [(20, "brand new second epoch text")],
        "doc_id long, text string"), path, batch_id=2, near=False)
    df = read_tier(spark, path, "exact", as_of_seq=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_batch_id" in plan.split("PartitionFilters", 1)[1][:200], plan


def test_salted_span_join_keys_on_gram_and_salt(spark):
    """The salted path's semi-join must key on (_k, _salt) — the
    whole point is that the hot gram's rows hash to `salt` partitions
    instead of one."""
    from graphlite_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [(1, "permission is hereby granted free of charge"),
         (2, "permission is hereby granted free of charge")],
        "doc_id long, text string")
    plan = span_dedup(docs, k=4, skew="salted")._jdf \
        .queryExecution().analyzed().toString()
    assert "_salt" in plan
