"""Optimistic multi-writer commits + time travel for the persisted
index manifest layer (r11: VERDICT r10 asks #1 and #2).

Multi-writer: the APPEND path recovers from a lost manifest race with
bounded retry-with-rebase — interleaved ingest epochs on disjoint
concerns (a competing compaction, another writer's already-landed
epoch) both land, serialized by the manifest log; a same-batch
conflict carrying DIFFERENT data still raises, now BEFORE any commit
(publish_delta's stage+rename verifies against an already-present
partition instead of silently interleaving files into it).

Time travel: read_tier(as_of_seq=) / versions() answer exactly as a
reader at that manifest commit saw the index, across epochs AND
across one compaction (the GC one-generation retention window);
snapshots older than the window raise a clear retention error.
"""

from __future__ import annotations

import pytest

from graphlite_spark.operators import index_store


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build(spark, path):
    from graphlite_spark.operators.dedup import build_dedup_index

    build_dedup_index(
        _docs(spark, [(1, "alpha bravo common words here"),
                      (2, "entirely different sentence content")]),
        path, n=3, num_hashes=64, bands=16)


def _kept_ids(spark, path, probe_rows, **kw):
    from graphlite_spark.operators.dedup import dedup_against_index

    return sorted(r.doc_id for r in dedup_against_index(
        _docs(spark, probe_rows), path, near=False, **kw).collect())


# ---------------------------------------------------------------------------
# publish_delta: stage + rename conflict semantics
# ---------------------------------------------------------------------------

def test_publish_conflict_identical_data_is_adopted(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build(spark, path)
    df = spark.createDataFrame([(11,), (22,)], "h long")
    index_store.publish_delta(spark, path, "exact", df, 1)
    # second writer (or a crash replay) staging the SAME rows adopts
    # the existing partition — no raise, content unchanged
    index_store.publish_delta(spark, path, "exact", df, 1)
    got = sorted(r.h for r in
                 spark.read.parquet(f"{path}/exact_delta").collect())
    assert got == [11, 22]


def test_publish_conflict_different_data_raises(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build(spark, path)
    index_store.publish_delta(
        spark, path, "exact",
        spark.createDataFrame([(11,)], "h long"), 1)
    with pytest.raises(ValueError, match="conflicting delta partition"):
        index_store.publish_delta(
            spark, path, "exact",
            spark.createDataFrame([(99,)], "h long"), 1)
    # the loser's files never entered the partition
    got = [r.h for r in
           spark.read.parquet(f"{path}/exact_delta").collect()]
    assert got == [11]
    # and the loser's staging dir was cleaned up
    import os

    stage = os.path.join(path, ".stage")
    assert not os.path.isdir(stage) or os.listdir(stage) == []


def test_publish_empty_vs_nonempty_conflict_raises(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build(spark, path)
    empty = spark.createDataFrame([], "h long")
    index_store.publish_delta(spark, path, "exact", empty, 1)
    with pytest.raises(ValueError, match="conflicting delta partition"):
        index_store.publish_delta(
            spark, path, "exact",
            spark.createDataFrame([(7,)], "h long"), 1)
    # empty vs empty adopts fine
    index_store.publish_delta(spark, path, "exact", empty, 1)


# ---------------------------------------------------------------------------
# commit_epoch_with_rebase
# ---------------------------------------------------------------------------

def test_rebase_past_interloper_commit(spark, tmp_path):
    """A commit that loses the manifest seq race to a DISJOINT commit
    (here: a metadata-only commit standing in for a concurrent
    compaction) rebases and lands; the log serializes the order."""
    path = str(tmp_path / "idx")
    _build(spark, path)
    mode, m = index_store.fence_epoch(spark, path, 1)
    assert mode == "run"
    index_store.publish_delta(
        spark, path, "exact",
        spark.createDataFrame([(5,)], "h long"), 1)
    # interloper wins the seq this writer planned to use
    m_int = dict(m)
    m_int["seq"] = int(m["seq"]) + 1
    index_store.commit_manifest(spark, path, m_int)
    out = index_store.commit_epoch_with_rebase(spark, path, 1, m)
    assert out == "committed"
    m2 = index_store.current_manifest(spark, path)
    assert m2["hwm"] == 1 and m2["seq"] == int(m["seq"]) + 2
    # the epoch's rows are visible through the committed manifest
    delta = index_store.read_delta(spark, path, "exact", m2)
    assert [r.h for r in delta.collect()] == [5]


def test_rebase_detects_duplicate_commit(spark, tmp_path):
    """When the interloper committed THIS batch_id, the rebase
    reports 'duplicate' instead of raising — publish_delta already
    verified the committed partition carries this writer's rows."""
    path = str(tmp_path / "idx")
    _build(spark, path)
    mode, m = index_store.fence_epoch(spark, path, 1)
    df = spark.createDataFrame([(5,)], "h long")
    index_store.publish_delta(spark, path, "exact", df, 1)
    # the OTHER writer adopted the identical partition and committed
    index_store.commit_epoch(spark, path, 1, m)
    out = index_store.commit_epoch_with_rebase(spark, path, 1, m)
    assert out == "duplicate"
    assert index_store.current_manifest(spark, path)["hwm"] == 1


def test_rebase_gives_up_after_max_retries(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build(spark, path)
    _, m = index_store.fence_epoch(spark, path, 1)
    orig = index_store.commit_epoch

    def always_lose(spark_, path_, batch_id_, manifest_):
        raise index_store.ManifestConflict("simulated perpetual race")

    index_store.commit_epoch = always_lose
    try:
        with pytest.raises(RuntimeError, match="gave up after"):
            index_store.commit_epoch_with_rebase(
                spark, path, 1, m, max_retries=2)
    finally:
        index_store.commit_epoch = orig


# ---------------------------------------------------------------------------
# two-writer integration through the real ingest operator
# ---------------------------------------------------------------------------

def test_two_writers_disjoint_batches_both_land(spark, tmp_path,
                                                monkeypatch):
    """Writer A is mid-epoch-1 when a concurrent compaction commits
    between A's delta publish and A's manifest commit; A rebases and
    lands. Epoch 2 then lands normally. The final index equals the
    never-raced sequential run (answers identical)."""
    from graphlite_spark.operators.dedup import (
        compact_dedup_index,
        dedup_index_ingest_batch,
    )

    probe = [(90, "fresh epoch one content okay"),
             (91, "alpha bravo common words here"),
             (92, "brand new second epoch text"),
             (93, "never seen text at all here")]

    # golden: sequential, no race
    golden = str(tmp_path / "golden")
    _build(spark, golden)
    dedup_index_ingest_batch(
        _docs(spark, [(10, "fresh epoch one content okay")]), golden,
        batch_id=1, near=False)
    dedup_index_ingest_batch(
        _docs(spark, [(20, "brand new second epoch text")]), golden,
        batch_id=2, near=False)
    expected = _kept_ids(spark, golden, probe)
    assert expected == [93]

    # raced: a compaction interleaves inside epoch 1's commit window
    raced = str(tmp_path / "raced")
    _build(spark, raced)
    orig = index_store.commit_epoch_with_rebase
    fired = {"n": 0}

    def racing(spark_, path_, batch_id_, manifest_, **kw):
        if fired["n"] == 0:
            fired["n"] = 1
            compact_dedup_index(spark_, path_)
        return orig(spark_, path_, batch_id_, manifest_, **kw)

    monkeypatch.setattr(index_store, "commit_epoch_with_rebase", racing)
    surv = dedup_index_ingest_batch(
        _docs(spark, [(10, "fresh epoch one content okay")]), raced,
        batch_id=1, near=False)
    assert [r.doc_id for r in surv.collect()] == [10]
    assert fired["n"] == 1  # the race actually happened
    monkeypatch.setattr(index_store, "commit_epoch_with_rebase", orig)
    dedup_index_ingest_batch(
        _docs(spark, [(20, "brand new second epoch text")]), raced,
        batch_id=2, near=False)
    assert _kept_ids(spark, raced, probe) == expected
    # the log serialized: build, interloper compaction, epoch 1's
    # rebased commit, epoch 2
    vs = index_store.versions(spark, raced)
    assert [v["hwm"] for v in vs] == [None, None, 1, 2]


def test_two_writers_same_batch_identical_data_noop(spark, tmp_path,
                                                    monkeypatch):
    """Two schedulers deliver the SAME epoch with the SAME data; the
    loser adopts the winner's partition at publish, sees 'duplicate'
    at commit, and both return the same survivors."""
    from graphlite_spark.operators.dedup import dedup_index_ingest_batch

    path = str(tmp_path / "idx")
    _build(spark, path)
    batch = [(10, "fresh epoch one content okay")]
    orig = index_store.commit_epoch_with_rebase
    fired = {"n": 0}

    def racing(spark_, path_, batch_id_, manifest_, **kw):
        if fired["n"] == 0:
            fired["n"] = 1
            # writer B runs the complete epoch 1 with identical data
            # and commits first
            surv_b = dedup_index_ingest_batch(
                _docs(spark, batch), path_, batch_id=1, near=False)
            assert [r.doc_id for r in surv_b.collect()] == [10]
        return orig(spark_, path_, batch_id_, manifest_, **kw)

    monkeypatch.setattr(index_store, "commit_epoch_with_rebase", racing)
    surv_a = dedup_index_ingest_batch(
        _docs(spark, batch), path, batch_id=1, near=False)
    assert [r.doc_id for r in surv_a.collect()] == [10]
    assert fired["n"] == 1
    # exactly one copy of the key landed
    n = spark.read.parquet(f"{path}/exact_delta").count()
    assert n == 1


def test_two_writers_same_batch_different_data_raises(spark, tmp_path,
                                                      monkeypatch):
    """Two schedulers deliver the SAME epoch with DIFFERENT data: the
    second writer's publish verifies against the first's partition
    and raises BEFORE any commit — no silent interleave, no commit of
    mixed content."""
    from graphlite_spark.operators.dedup import dedup_index_ingest_batch

    path = str(tmp_path / "idx")
    _build(spark, path)
    orig = index_store.commit_epoch_with_rebase

    def racing(spark_, path_, batch_id_, manifest_, **kw):
        # writer B runs epoch 1 with DIFFERENT data after A's publish
        dedup_index_ingest_batch(
            _docs(spark, [(30, "totally other payload text")]), path_,
            batch_id=1, near=False)
        return orig(spark_, path_, batch_id_, manifest_, **kw)

    monkeypatch.setattr(index_store, "commit_epoch_with_rebase", racing)
    with pytest.raises(ValueError, match="conflicting delta partition"):
        dedup_index_ingest_batch(
            _docs(spark, [(10, "fresh epoch one content okay")]), path,
            batch_id=1, near=False)
    monkeypatch.setattr(index_store, "commit_epoch_with_rebase", orig)
    # nothing committed: hwm untouched, a clean epoch 1 still lands
    assert index_store.current_manifest(spark, path).get("hwm") is None
    # the conflicting uncommitted partition must be cleared by the
    # operator that owns the retry decision — simulate the documented
    # manual intervention, then the epoch lands
    import shutil

    shutil.rmtree(f"{path}/exact_delta", ignore_errors=True)
    surv = dedup_index_ingest_batch(
        _docs(spark, [(10, "fresh epoch one content okay")]), path,
        batch_id=1, near=False)
    assert [r.doc_id for r in surv.collect()] == [10]


# ---------------------------------------------------------------------------
# time travel: versions() + as_of_seq reads
# ---------------------------------------------------------------------------

def test_versions_lists_retained_generations(spark, tmp_path):
    from graphlite_spark.operators.dedup import dedup_index_ingest_batch

    path = str(tmp_path / "idx")
    _build(spark, path)
    dedup_index_ingest_batch(
        _docs(spark, [(10, "fresh epoch one content okay")]), path,
        batch_id=1, near=False)
    dedup_index_ingest_batch(
        _docs(spark, [(20, "brand new second epoch text")]), path,
        batch_id=2, near=False)
    vs = index_store.versions(spark, path)
    assert [v["seq"] for v in vs] == [1, 2, 3]
    assert [v["hwm"] for v in vs] == [None, 1, 2]


def test_asof_read_across_epochs(spark, tmp_path):
    """Reading at the post-epoch-1 manifest does NOT see epoch 2's
    keys: the epoch-2 text only drops against the newest snapshot."""
    from graphlite_spark.operators.dedup import dedup_index_ingest_batch

    path = str(tmp_path / "idx")
    _build(spark, path)
    dedup_index_ingest_batch(
        _docs(spark, [(10, "fresh epoch one content okay")]), path,
        batch_id=1, near=False)
    dedup_index_ingest_batch(
        _docs(spark, [(20, "brand new second epoch text")]), path,
        batch_id=2, near=False)
    probe = [(90, "fresh epoch one content okay"),
             (92, "brand new second epoch text"),
             (93, "never seen text at all here")]
    assert _kept_ids(spark, path, probe) == [93]
    assert _kept_ids(spark, path, probe, as_of_seq=2) == [92, 93]
    assert _kept_ids(spark, path, probe, as_of_seq=1) == [90, 92, 93]


def test_asof_read_across_one_compaction(spark, tmp_path):
    """A pre-compaction snapshot resolves the OLD base + deltas (GC
    keeps one superseded generation); after a SECOND compaction the
    old snapshot raises the retention error instead of answering from
    a partial layout."""
    from graphlite_spark.operators.dedup import (
        compact_dedup_index,
        dedup_index_ingest_batch,
    )

    path = str(tmp_path / "idx")
    _build(spark, path)
    dedup_index_ingest_batch(
        _docs(spark, [(10, "fresh epoch one content okay")]), path,
        batch_id=1, near=False)
    pre = index_store.current_manifest(spark, path)["seq"]  # epochs seq
    compact_dedup_index(spark, path)
    # snapshot BEFORE the compaction: old base + epoch-1 delta live
    probe = [(90, "fresh epoch one content okay"),
             (91, "alpha bravo common words here"),
             (93, "never seen text at all here")]
    assert _kept_ids(spark, path, probe, as_of_seq=pre) == [93]
    # and the post-compaction read agrees (key-set preserving)
    assert _kept_ids(spark, path, probe) == [93]
    # a second compaction sweeps the superseded generation
    dedup_index_ingest_batch(
        _docs(spark, [(20, "brand new second epoch text")]), path,
        batch_id=2, near=False)
    compact_dedup_index(spark, path)
    with pytest.raises(ValueError, match="retention window"):
        _kept_ids(spark, path, probe, as_of_seq=pre)


def test_manifest_at_missing_seq_raises(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build(spark, path)
    with pytest.raises(ValueError, match="no manifest seq 99"):
        index_store.manifest_at(spark, path, 99)


def test_bm25_asof_read(spark, tmp_path):
    """bm25_search_indexed(as_of_seq=): df/n_docs/avgdl — and hence
    scores — come from the snapshot's tiers, so a doc indexed by a
    LATER epoch never appears and idf reflects the smaller corpus."""
    from graphlite_spark.operators.text import (
        bm25_index_ingest_batch,
        bm25_search_indexed,
        build_bm25_index,
    )

    path = str(tmp_path / "bm25")
    c1 = spark.createDataFrame(
        [(1, "spark shuffles data across executors"),
         (2, "parquet stores columnar data")],
        "doc_id long, text string")
    build_bm25_index(c1, path)
    bm25_index_ingest_batch(spark.createDataFrame(
        [(3, "spark reads parquet data fast")],
        "doc_id long, text string"), path, batch_id=1)
    seq1 = index_store.current_manifest(spark, path)["seq"]
    bm25_index_ingest_batch(spark.createDataFrame(
        [(4, "spark executors cache spark data")],
        "doc_id long, text string"), path, batch_id=2)
    now = [(r.doc_id, r.score) for r in bm25_search_indexed(
        spark, path, ["spark", "data"], k=10).collect()]
    asof = [(r.doc_id, r.score) for r in bm25_search_indexed(
        spark, path, ["spark", "data"], k=10, as_of_seq=seq1).collect()]
    assert 4 in {d for d, _ in now}
    assert 4 not in {d for d, _ in asof}
    assert {d for d, _ in asof} == {1, 2, 3}
    # scores differ: the snapshot's df/n_docs are the smaller corpus's
    assert dict(asof) != {d: s for d, s in now if d != 4}


def test_ann_asof_read(spark, tmp_path):
    """rescore_topk_indexed(as_of_seq=): candidates come only from
    the snapshot's code tiers — a vector ingested later is invisible
    even at candidate_fraction=1.0."""
    from graphlite_spark.operators.similarity import (
        ann_index_ingest_batch,
        build_rescore_index,
        rescore_topk_indexed,
    )

    def vecs(ids):
        return spark.createDataFrame(
            [(i, [float(i % 3) + 0.25, float(i % 5) - 1.5, 0.5 * i])
             for i in ids],
            "vec_id long, embedding array<double>")

    path = str(tmp_path / "ann")
    build_rescore_index(vecs(range(8)), path, bits=8)
    ann_index_ingest_batch(vecs(range(8, 12)), path, batch_id=1)
    seq1 = index_store.current_manifest(spark, path)["seq"]
    ann_index_ingest_batch(vecs(range(12, 15)), path, batch_id=2)
    items = vecs(range(15))
    queries = spark.createDataFrame(
        [(100, [1.0, 0.5, 2.0])], "query_id long, embedding array<double>")
    now = {r.item_id for r in rescore_topk_indexed(
        items, queries, path, k=15, candidate_fraction=1.0).collect()}
    asof = {r.item_id for r in rescore_topk_indexed(
        items, queries, path, k=15, candidate_fraction=1.0,
        as_of_seq=seq1).collect()}
    assert now == set(range(15))
    assert asof == set(range(12))


def test_scheduled_compaction_tolerates_lost_race(spark, tmp_path,
                                                  monkeypatch):
    """A scheduled in-loop compaction that loses the manifest race
    (another loop on the same index compacted first) SKIPS instead of
    killing the stream — hygiene, not data; the epoch still lands."""
    from graphlite_spark.operators import dedup as dedup_mod
    from graphlite_spark.operators.dedup import build_dedup_index
    from graphlite_spark.streaming import stateful
    from graphlite_spark.streaming.stateful import (
        streaming_dedup_index_maintenance,
    )

    path = str(tmp_path / "idx")
    _build(spark, path)
    streaming_dedup_index_maintenance(
        _docs(spark, [(10, "fresh epoch one content okay")]), path,
        checkpoint=str(tmp_path / "ck"), near=False)
    # epoch 0 committed; schedule a compaction before... epoch counter
    # in the batch fallback is always 0, so drive _maybe_compact
    # directly the way the loop does at a boundary epoch
    def losing_compact(spark_, path_, **kw):
        raise index_store.ManifestConflict("another compactor won")

    monkeypatch.setattr(dedup_mod, "compact_dedup_index",
                        losing_compact)
    # hwm == 0, boundary batch_id == 1, compact_every == 1 -> the
    # gate fires, the compaction loses, and the helper reports False
    # instead of raising
    assert stateful._maybe_compact(spark, path, 1, 1) is False
