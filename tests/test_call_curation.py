"""CALL surface for the curation tier (VERDICT r9 #6): the flagship
data-pipeline operators — Gopher quality flags, language ID, exact /
near dedup — reachable from GQL over a session graph's document
label, outputs pinned against the DataFrame operators they wrap.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def doc_db(spark):
    from graphlite_spark import GraphLiteSpark, PropertyGraph

    long_good = ("the quick brown fox jumps over the lazy dog and then "
                 "walks into the red barn where it finds a warm place "
                 "to sleep through the long cold winter night with food "
                 "and water and hay and all the comfort it could want "
                 "while the farmer tends to his other animals outside "
                 "in the snow covered yard near the frozen pond")
    rows = [
        (1, long_good, "en"),
        (2, long_good, "en"),                       # exact dup of 1
        (3, long_good.replace("fox", "cat"), "en"),  # near dup of 1
        (4, "zz", "und"),                            # fails gopher
        (5, "der hund läuft schnell durch den wald und springt über "
            "einen baum weil er die katze jagt die auf der wiese "
            "sitzt und die vögel beobachtet die im himmel fliegen "
            "während die sonne langsam hinter den bergen verschwindet "
            "und der mond aufgeht über dem stillen dunklen tal wo "
            "niemand wohnt außer ein paar alten müden tieren", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    g = PropertyGraph(spark, name="corpus")
    g.add_nodes("Document", docs, "doc_id")
    db = GraphLiteSpark(spark)
    db.register_graph(g)
    return db, docs


def test_call_gopher_filters_matches_operator(doc_db):
    from graphlite_spark.operators.text import gopher_quality_filters

    db, docs = doc_db
    got = {r["_id"]: r["gopher_pass"] for r in db.execute(
        "CALL gql.gopher_filters('Document', 'text', 40, 1)").collect()}
    want = {r["doc_id"]: r["gopher_pass"] for r in gopher_quality_filters(
        docs, min_words=40, min_stop_words=1).collect()}
    assert got == want
    assert got[1] and not got[4]  # both outcomes exercised


def test_call_lang_id_matches_operator(doc_db):
    from graphlite_spark.operators.text import lang_id

    db, docs = doc_db
    got = {r["_id"]: r["lang_guess"] for r in db.execute(
        "CALL gql.lang_id('Document', 'text')").collect()}
    want = {r["doc_id"]: r["lang_guess"]
            for r in lang_id(docs).collect()}
    assert got == want
    assert got[1] == "en" and got[5] == "de"


def test_call_dedup_exact(doc_db):
    db, _docs = doc_db
    got = {r["_id"]: r["canonical_id"] for r in db.execute(
        "CALL gql.dedup('Document', 'text', 'exact')").collect()}
    # 1 and 2 share text -> canonical 1; everyone else self-canonical
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}


def test_call_dedup_near_matches_cluster_operators(doc_db):
    from graphlite_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    db, docs = doc_db
    got = {r["_id"]: r["canonical_id"] for r in db.execute(
        "CALL gql.dedup('Document', 'text', 'near', 0.8)").collect()}
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    want = {r["doc_id"]: r["canonical_id"]
            for r in dedup_clusters(docs, pairs).collect()}
    assert got == want
    # the near-dup (3) folds into 1's cluster; the exact dup trivially
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4 and got[5] == 5


def test_call_dedup_bad_mode_raises(doc_db):
    db, _docs = doc_db
    with pytest.raises(ValueError, match="exact.*near|near.*exact"):
        db.execute("CALL gql.dedup('Document', 'text', 'fuzzy')")
