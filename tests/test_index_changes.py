"""CHANGELOG (CDC) reads + filesystem-only ops summary over the
persisted-index manifest log (index_store.tier_changes /
describe_index).

tier_changes answers "what did this tier gain between manifest seq a
and seq b" from the per-epoch delta partitions alone — a
directory-pruned O(changes) read however large the base — and its
fast path must equal the as-of snapshot set-difference (the slow
ground truth). When a compaction folded part of the requested range
the fast path is impossible: the default raises a retention-style
error and on_folded='diff' falls back to the snapshot diff.
"""

from __future__ import annotations

import shutil

import pytest

from graphlite_spark.operators import index_store


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build_with_epochs(spark, path):
    """seq 1 = build (docs 1,2), seq 2 = epoch 1 (doc 10), seq 3 =
    epoch 2 (doc 20). Every text is distinct, so each epoch appends
    exactly one exact-tier key."""
    from graphlite_spark.operators.dedup import (
        build_dedup_index,
        dedup_index_ingest_batch,
    )

    build_dedup_index(
        _docs(spark, [(1, "alpha bravo common words here"),
                      (2, "entirely different sentence content")]),
        path, n=3, num_hashes=64, bands=16)
    dedup_index_ingest_batch(
        _docs(spark, [(10, "fresh epoch one content okay")]),
        path, batch_id=1)
    dedup_index_ingest_batch(
        _docs(spark, [(20, "brand new second epoch text")]),
        path, batch_id=2)


def _rows(df):
    return sorted((r.h, r._batch_id) for r in df.collect())


# ---------------------------------------------------------------------------
# fast path
# ---------------------------------------------------------------------------

def test_changes_fast_path_across_epochs(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build_with_epochs(spark, path)
    # since the build (seq 1): both epochs, each under its batch id
    both = _rows(index_store.tier_changes(spark, path, "exact", 1))
    assert [b for _, b in both] == [1, 2] or [b for _, b in both] == [2, 1]
    assert len(both) == 2
    # since epoch 1's commit (seq 2): only epoch 2's key
    ep2 = _rows(index_store.tier_changes(spark, path, "exact", 2))
    assert len(ep2) == 1 and ep2[0][1] == 2
    assert ep2[0] in both
    # a closed range isolates one epoch
    ep1 = _rows(index_store.tier_changes(spark, path, "exact", 1,
                                         to_seq=2))
    assert len(ep1) == 1 and ep1[0][1] == 1
    # no-op ranges are empty (same seq; current-to-current)
    assert _rows(index_store.tier_changes(spark, path, "exact", 3)) == []
    assert _rows(index_store.tier_changes(spark, path, "exact", 2,
                                          to_seq=2)) == []


def test_changes_fast_path_equals_snapshot_diff(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build_with_epochs(spark, path)
    fast = index_store.tier_changes(spark, path, "exact", 1, to_seq=3)
    new = index_store.read_tier(spark, path, "exact", as_of_seq=3)
    old = index_store.read_tier(spark, path, "exact", as_of_seq=1)
    diff = sorted(r.h for r in new.exceptAll(old).collect())
    assert sorted(r.h for r in fast.collect()) == diff


def test_changes_validation(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build_with_epochs(spark, path)
    with pytest.raises(ValueError, match="newer than to_seq"):
        index_store.tier_changes(spark, path, "exact", 3, to_seq=1)
    with pytest.raises(ValueError, match="on_folded"):
        index_store.tier_changes(spark, path, "exact", 1,
                                 on_folded="maybe")
    shutil.rmtree(f"{path}/{index_store.MANIFEST_DIR}")
    with pytest.raises(ValueError, match="no manifest log"):
        index_store.tier_changes(spark, path, "exact", 1)


# ---------------------------------------------------------------------------
# compaction interplay
# ---------------------------------------------------------------------------

def test_changes_across_compaction(spark, tmp_path):
    from graphlite_spark.operators.dedup import (
        compact_dedup_index,
        dedup_index_ingest_batch,
    )

    path = str(tmp_path / "idx")
    _build_with_epochs(spark, path)
    compact_dedup_index(spark, path)          # seq 4, delta_floor=2
    dedup_index_ingest_batch(
        _docs(spark, [(30, "a third epoch novel document")]),
        path, batch_id=3)                     # seq 5
    # range entirely above the floor: fast path still answers
    ep3 = _rows(index_store.tier_changes(spark, path, "exact", 4))
    assert len(ep3) == 1 and ep3[0][1] == 3
    # range reaching under the floor: fast path impossible -> raise
    with pytest.raises(ValueError, match="folded into a compacted"):
        index_store.tier_changes(spark, path, "exact", 1)
    # ... and the declared fallback answers via snapshot diff
    diff = index_store.tier_changes(spark, path, "exact", 1,
                                    on_folded="diff")
    got = sorted(r.h for r in diff.collect())
    new = index_store.read_tier(spark, path, "exact")
    old = index_store.read_tier(spark, path, "exact", as_of_seq=1)
    assert got == sorted(r.h for r in new.exceptAll(old).collect())
    assert len(got) == 3
    assert [r._batch_id for r in diff.collect()] == [None] * 3
    # a compaction with NO epochs after it: empty changes, fast path
    assert _rows(index_store.tier_changes(spark, path, "exact", 3,
                                          to_seq=4)) == []


def test_changes_bm25_increment_semantics(spark, tmp_path):
    """For the SUM-mergeable BM25 tiers the changelog rows are the
    per-epoch increments: snapshot(from) + changes == snapshot(to)
    when aggregated per term."""
    from pyspark.sql import functions as F

    from graphlite_spark.operators.text import (
        bm25_index_ingest_batch,
        build_bm25_index,
    )

    path = str(tmp_path / "bm")
    build_bm25_index(_docs(spark, [
        (1, "spark shuffles data across executors"),
        (2, "parquet stores columnar data")]), path)
    bm25_index_ingest_batch(
        _docs(spark, [(3, "spark reads parquet data fast")]),
        path, batch_id=1)
    bm25_index_ingest_batch(
        _docs(spark, [(4, "executors cache data in memory")]),
        path, batch_id=2)
    ch = index_store.tier_changes(spark, path, "terms", 2)
    old = index_store.read_tier(spark, path, "terms", as_of_seq=2)
    new = index_store.read_tier(spark, path, "terms", as_of_seq=3)

    def _df_by_term(df):
        return {r.term: r.s for r in
                df.groupBy("term").agg(F.sum("df").alias("s")).collect()}

    merged = _df_by_term(old.select("term", "df")
                         .unionByName(ch.select("term", "df")))
    assert merged == _df_by_term(new.select("term", "df"))
    assert {r._batch_id for r in ch.collect()} == {2}


# ---------------------------------------------------------------------------
# describe_index
# ---------------------------------------------------------------------------

def test_describe_index_fs_only_summary(spark, tmp_path):
    from graphlite_spark.operators.dedup import compact_dedup_index

    path = str(tmp_path / "idx")
    _build_with_epochs(spark, path)
    d = index_store.describe_index(spark, path)
    assert d["seq"] == 3 and d["hwm"] == 2 and d["delta_floor"] is None
    assert set(d["tiers"]) == {"exact", "bands"}
    ex = d["tiers"]["exact"]
    assert ex["base_dir"] == "exact"
    assert ex["base_bytes"] > 0 and ex["base_files"] >= 1
    assert ex["delta_epochs"] == [1, 2]
    assert d["retained_seqs"] == [1, 2, 3]
    compact_dedup_index(spark, path)
    d2 = index_store.describe_index(spark, path)
    assert d2["seq"] == 4 and d2["delta_floor"] == 2
    assert d2["version"] == d["version"] + 1
    assert d2["tiers"]["exact"]["base_dir"] != "exact"


# ---------------------------------------------------------------------------
# CALL surface: gql.index_versions / index_describe / index_changes
# ---------------------------------------------------------------------------

def test_call_index_ops_match_python_api(spark, tmp_path):
    """The index ops surface reachable from GQL: versions, describe
    and changelog as CALL procedures, pinned against the Python API
    (same manifest log, same rows)."""
    from graphlite_spark import GraphLiteSpark

    path = str(tmp_path / "idx")
    _build_with_epochs(spark, path)
    db = GraphLiteSpark(spark)

    vs = db.execute(f"CALL gql.index_versions('{path}')").collect()
    assert [(r.seq, r.hwm) for r in vs] == [(1, None), (2, 1), (3, 2)]

    de = {r.tier: r for r in
          db.execute(f"CALL gql.index_describe('{path}')").collect()}
    assert set(de) == {"exact", "bands"}
    assert de["exact"].delta_epochs == 2 and de["exact"].seq == 3
    assert de["exact"].base_bytes > 0

    ch = db.execute(
        f"CALL gql.index_changes('{path}', 'exact', 2)").collect()
    api = index_store.tier_changes(spark, path, "exact", 2).collect()
    assert sorted((r.h, r._batch_id) for r in ch) \
        == sorted((r.h, r._batch_id) for r in api)
    # YIELD projection works on the procedure result
    only = db.execute(
        f"CALL gql.index_changes('{path}', 'exact', 1, 2) "
        f"YIELD _batch_id").collect()
    assert [r._batch_id for r in only] == [1]


# ---------------------------------------------------------------------------
# generality: the changelog works over the ANN and profile families
# ---------------------------------------------------------------------------

def test_changes_ann_codes(spark, tmp_path):
    """The ANN codes tier's changelog rows are the per-epoch encoded
    vectors — consumers syncing a mirror index apply exactly them."""
    from graphlite_spark.operators.similarity import (
        ann_index_ingest_batch,
        build_rescore_index,
    )

    def _vecs(ids):
        return spark.createDataFrame(
            [(i, [float(i % 3) + 0.25, float(i % 5) - 1.5, 0.5 * i])
             for i in ids],
            "vec_id long, embedding array<double>")

    path = str(tmp_path / "ann")
    build_rescore_index(_vecs(range(8)), path, bits=8)
    ann_index_ingest_batch(_vecs(range(8, 12)), path, batch_id=1)
    ann_index_ingest_batch(_vecs(range(12, 15)), path, batch_id=2)
    ch = index_store.tier_changes(spark, path, "codes", 2)
    ids = sorted(r._iid for r in ch.collect())
    assert ids == [12, 13, 14]
    assert {r._batch_id for r in ch.collect()} == {2}
    # the per-epoch meta counts are SUM increments
    mch = index_store.tier_changes(spark, path, "meta", 1)
    assert sorted(r.n_items for r in mch.collect()) == [3, 4]


def test_changes_profile_sketches(spark, tmp_path):
    """Profile sketch tiers: per-epoch mergeable rows ARE the
    changelog; merged(from-snapshot + changes) == to-snapshot for
    the SUM scalars."""
    from pyspark.sql import functions as F

    from graphlite_spark.operators.profile_store import (
        build_profile_index,
        profile_index_ingest_batch,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    c1, c2 = n // 3, 2 * n // 3
    path = str(tmp_path / "prof")
    build_profile_index(docs.filter(F.col("doc_id") < c1), path)
    profile_index_ingest_batch(
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        path, batch_id=1)
    profile_index_ingest_batch(
        docs.filter(F.col("doc_id") >= c2), path, batch_id=2)
    ch = index_store.tier_changes(spark, path, "scalars", 2)
    assert {r._batch_id for r in ch.collect()} == {2}
    old = index_store.read_tier(spark, path, "scalars", as_of_seq=2)
    new = index_store.read_tier(spark, path, "scalars", as_of_seq=3)

    def _docs_by_group(df):
        return {r.g: r.s for r in
                df.groupBy("g").agg(F.sum("n_docs").alias("s"))
                .collect()}

    merged = _docs_by_group(old.select("g", "n_docs").unionByName(
        ch.select("g", "n_docs")))
    assert merged == _docs_by_group(new.select("g", "n_docs"))


# ---------------------------------------------------------------------------
# review fix: never-published tier partitions are not "GC'd"
# ---------------------------------------------------------------------------

def test_near_false_epochs_do_not_break_bands_asof_or_changes(
        spark, tmp_path):
    """near=False ingests never publish a bands partition; as-of
    reads and the changelog on the bands tier must treat the missing
    directories as 'no rows', not as a GC retention violation."""
    from graphlite_spark.operators.dedup import (
        build_dedup_index,
        dedup_against_index,
        dedup_index_ingest_batch,
    )

    path = str(tmp_path / "idx")
    build_dedup_index(
        _docs(spark, [(1, "alpha bravo common words here")]),
        path, n=3, num_hashes=64, bands=16)
    dedup_index_ingest_batch(
        _docs(spark, [(10, "fresh epoch one content okay")]),
        path, batch_id=1, near=False)
    dedup_index_ingest_batch(
        _docs(spark, [(20, "brand new second epoch text")]),
        path, batch_id=2, near=False)
    # bands changelog: epochs appended nothing -> empty, no raise
    ch = index_store.tier_changes(spark, path, "bands", 1)
    assert ch.count() == 0
    # near=True against-index read AS OF the current seq: the bands
    # snapshot check must pass (base only, no epoch partitions)
    probe = _docs(spark, [(90, "fresh epoch one content okay"),
                          (91, "completely novel probe text here")])
    kept = sorted(r.doc_id for r in dedup_against_index(
        probe, path, near=True, as_of_seq=3).collect())
    assert kept == [91]
    # a mirror of this index syncs and answers identically
    dst = str(tmp_path / "dst")
    out = index_store.sync_index(spark, path, dst)
    assert out["applied"] == [1, 2]
    kept_m = sorted(r.doc_id for r in dedup_against_index(
        probe, dst, near=True).collect())
    assert kept_m == sorted(r.doc_id for r in dedup_against_index(
        probe, path, near=True).collect())
