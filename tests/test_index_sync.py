"""Incremental index replication (index_store.sync_index): a mirror
bootstraps once from the source's bases, then each sync ships ONLY
the delta epochs the mirror hasn't seen — re-published through the
mirror's own stage+rename, fencing and optimistic commits, so the
mirror is a full first-class index (fenced, compactable,
time-travelable, answering every against-index read identically).
"""

from __future__ import annotations

import pytest

from graphlite_spark.operators import index_store


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _epoch_docs(spark, k):
    return _docs(spark, [(100 * k + i,
                          f"epoch {k} document {i} unique body text")
                         for i in range(3)])


def _build_src(spark, path, epochs=2):
    from graphlite_spark.operators.dedup import (
        build_dedup_index,
        dedup_index_ingest_batch,
    )

    build_dedup_index(
        _docs(spark, [(1, "alpha bravo common words here"),
                      (2, "entirely different sentence content")]),
        path, n=3, num_hashes=64, bands=16)
    for k in range(1, epochs + 1):
        dedup_index_ingest_batch(_epoch_docs(spark, k), path,
                                 batch_id=k, near=False)


def _kept(spark, path):
    from graphlite_spark.operators.dedup import dedup_against_index

    probe = _docs(spark, [
        (901, "alpha bravo common words here"),      # build dup
        (902, "epoch 1 document 0 unique body text"),  # epoch-1 dup
        (903, "epoch 2 document 2 unique body text"),  # epoch-2 dup
        (904, "never seen text at all here"),
    ])
    return sorted(r.doc_id for r in
                  dedup_against_index(probe, path, near=False)
                  .collect())


def test_bootstrap_then_incremental_sync(spark, tmp_path):
    from graphlite_spark.operators.dedup import dedup_index_ingest_batch

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_src(spark, src, epochs=2)
    out = index_store.sync_index(spark, src, dst)
    assert out["bootstrapped"] and out["applied"] == [1, 2]
    assert out["hwm"] == 2
    assert _kept(spark, dst) == _kept(spark, src) == [904]
    # idempotent: nothing new to apply
    again = index_store.sync_index(spark, src, dst)
    assert not again["bootstrapped"] and again["applied"] == []
    # two more source epochs -> only they ship
    for k in (3, 4):
        dedup_index_ingest_batch(_epoch_docs(spark, k), src,
                                 batch_id=k, near=False)
    inc = index_store.sync_index(spark, src, dst)
    assert inc["applied"] == [3, 4] and inc["hwm"] == 4
    assert (sorted(r.h for r in
                   index_store.read_tier(spark, dst, "exact").collect())
            == sorted(r.h for r in
                      index_store.read_tier(spark, src, "exact")
                      .collect()))


def test_crashed_sync_replays_as_verified_noop(spark, tmp_path):
    from graphlite_spark.operators.dedup import dedup_index_ingest_batch

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_src(spark, src, epochs=1)
    index_store.sync_index(spark, src, dst)
    dedup_index_ingest_batch(_epoch_docs(spark, 2), src,
                             batch_id=2, near=False)
    # simulate a sync that crashed after publishing epoch 2's exact
    # partition but before the manifest commit
    d = index_store.read_delta(spark, src, "exact",
                               index_store.current_manifest(spark, src),
                               at_batch=2)
    index_store.publish_delta(spark, dst, "exact",
                              d.drop("_batch_id"), 2)
    out = index_store.sync_index(spark, src, dst)
    assert out["applied"] == [2]
    assert _kept(spark, dst) == _kept(spark, src)


def test_mirror_lagging_past_source_compaction_raises(spark, tmp_path):
    from graphlite_spark.operators.dedup import (
        compact_dedup_index,
        dedup_index_ingest_batch,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_src(spark, src, epochs=2)
    index_store.sync_index(spark, src, dst)          # mirror at hwm 2
    for k in (3, 4):
        dedup_index_ingest_batch(_epoch_docs(spark, k), src,
                                 batch_id=k, near=False)
    compact_dedup_index(spark, src)                  # folds 1..4
    dedup_index_ingest_batch(_epoch_docs(spark, 5), src,
                             batch_id=5, near=False)
    with pytest.raises(ValueError, match="lagged past"):
        index_store.sync_index(spark, src, dst)
    # a FRESH bootstrap of the compacted source works and matches
    dst2 = str(tmp_path / "dst2")
    out = index_store.sync_index(spark, src, dst2)
    assert out["bootstrapped"] and out["applied"] == [5]
    assert _kept(spark, dst2) == _kept(spark, src)


def test_mirror_is_independently_compactable(spark, tmp_path):
    from graphlite_spark.operators.dedup import (
        compact_dedup_index,
        dedup_index_ingest_batch,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_src(spark, src, epochs=2)
    index_store.sync_index(spark, src, dst)
    compact_dedup_index(spark, dst)                  # mirror-local
    assert _kept(spark, dst) == _kept(spark, src)
    dedup_index_ingest_batch(_epoch_docs(spark, 3), src,
                             batch_id=3, near=False)
    out = index_store.sync_index(spark, src, dst)    # still syncs
    assert out["applied"] == [3]
    assert (sorted(r.h for r in
                   index_store.read_tier(spark, dst, "exact").collect())
            == sorted(r.h for r in
                      index_store.read_tier(spark, src, "exact")
                      .collect()))


def test_sync_bm25_family_scores_match(spark, tmp_path):
    from graphlite_spark.operators.text import (
        bm25_index_ingest_batch,
        bm25_search_indexed,
        build_bm25_index,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    build_bm25_index(_docs(spark, [
        (1, "spark shuffles data across executors"),
        (2, "parquet stores columnar data")]), src)
    bm25_index_ingest_batch(
        _docs(spark, [(3, "spark reads parquet data fast")]),
        src, batch_id=1)
    out = index_store.sync_index(spark, src, dst)
    assert out["bootstrapped"] and out["applied"] == [1]
    a = [(r.doc_id, r.score) for r in bm25_search_indexed(
        spark, src, ["spark", "data"], k=10).collect()]
    b = [(r.doc_id, r.score) for r in bm25_search_indexed(
        spark, dst, ["spark", "data"], k=10).collect()]
    assert a == b


def test_sync_requires_a_manifest_log(spark, tmp_path):
    import shutil

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_src(spark, src, epochs=1)
    shutil.rmtree(f"{src}/{index_store.MANIFEST_DIR}")
    with pytest.raises(ValueError, match="no manifest log"):
        index_store.sync_index(spark, src, dst)


def test_call_index_sync_procedure(spark, tmp_path):
    from graphlite_spark import GraphLiteSpark

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_src(spark, src, epochs=2)
    db = GraphLiteSpark(spark)
    row = db.execute(
        f"CALL gql.index_sync('{src}', '{dst}')").collect()[0]
    assert row.bootstrapped and row.applied == 2 and row.hwm == 2
    assert _kept(spark, dst) == _kept(spark, src)
    again = db.execute(
        f"CALL gql.index_sync('{src}', '{dst}')").collect()[0]
    assert not again.bootstrapped and again.applied == 0
