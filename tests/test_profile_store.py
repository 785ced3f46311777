"""Persisted mergeable profile-sketch index (r11, VERDICT r10 ask #3):
merge-exactness (incremental == from-scratch at three SFs),
epoch fencing/replay, compaction, time travel, and the ingest-loop
co-maintenance path.
"""

from __future__ import annotations

import os

import pytest

from graphlite_spark.operators import index_store
from graphlite_spark.operators.profile_store import (
    build_profile_index,
    compact_profile_index,
    profile_index_ingest_batch,
    read_profile,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect())


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_incremental_profile_equals_from_scratch(spark, tmp_path, sf_dir):
    """build(part A) + epochs(parts B, C) + compaction answers the
    EXACT same profile as a from-scratch build over A ∪ B ∪ C — the
    merge-exactness property (max-of-maxes / sum-of-sums) end to end,
    at three scale factors."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    n = docs.count()
    c1, c2 = n // 3, 2 * n // 3
    inc = str(tmp_path / "inc")
    build_profile_index(docs.filter(F.col("doc_id") < c1), inc)
    profile_index_ingest_batch(
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        inc, batch_id=1)
    profile_index_ingest_batch(
        docs.filter(F.col("doc_id") >= c2), inc, batch_id=2)
    compact_profile_index(spark, inc)
    scratch = str(tmp_path / "scratch")
    build_profile_index(docs, scratch)
    got = _rows(read_profile(spark, inc))
    want = _rows(read_profile(spark, scratch))
    assert got == want
    assert len(got) == docs.select("lang").distinct().count()
    # exact columns really are exact
    by_lang = {r[0]: r for r in got}
    truth = {r["lang"]: r for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for lang, row in by_lang.items():
        assert row[1] == truth[lang]["n"]  # n_docs


def test_epoch_cost_is_batch_not_corpus(spark, tmp_path):
    """The epoch sketches read ONLY the batch frame: a 1-doc epoch on
    top of a big history still answers the right merged profile (no
    O(corpus) recompute anywhere in the maintain path)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, SF_DIRS[1])
    path = str(tmp_path / "p")
    build_profile_index(docs, path)
    one = spark.createDataFrame(
        [(999999, "one tiny new document here", "en", "unit", 27)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    profile_index_ingest_batch(one, path, batch_id=1)
    prof = {r["lang"]: r for r in read_profile(spark, path).collect()}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert prof["en"]["n_docs"] == n_en + 1


def test_replay_is_verified_noop_and_gap_raises(spark, tmp_path):
    docs = _docs(spark, SF_DIRS[0])
    from pyspark.sql import functions as F

    path = str(tmp_path / "p")
    build_profile_index(docs.filter(F.col("doc_id") < 30), path)
    ep = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))
    profile_index_ingest_batch(ep, path, batch_id=1)
    before = _rows(read_profile(spark, path))
    # identical re-delivery: verified no-op
    profile_index_ingest_batch(ep, path, batch_id=1)
    assert _rows(read_profile(spark, path)) == before
    # re-delivery with different data raises
    other = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 90))
    with pytest.raises(ValueError, match="replay verification failed"):
        profile_index_ingest_batch(other, path, batch_id=1)
    # gap raises
    with pytest.raises(ValueError, match="epoch gap"):
        profile_index_ingest_batch(other, path, batch_id=5)


def test_compaction_preserves_and_time_travel(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = _docs(spark, SF_DIRS[1])
    path = str(tmp_path / "p")
    build_profile_index(docs.filter(F.col("doc_id") < 200), path)
    profile_index_ingest_batch(
        docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)),
        path, batch_id=1)
    seq_e1 = index_store.current_manifest(spark, path)["seq"]
    prof_e1 = _rows(read_profile(spark, path))
    profile_index_ingest_batch(
        docs.filter(F.col("doc_id") >= 350), path, batch_id=2)
    full = _rows(read_profile(spark, path))
    assert full != prof_e1
    compact_profile_index(spark, path)
    # compaction preserves the profile
    assert _rows(read_profile(spark, path)) == full
    # time travel: the profile exactly as epoch 1 saw it (across the
    # compaction — GC keeps one superseded generation)
    assert _rows(read_profile(spark, path, as_of_seq=seq_e1)) == prof_e1
    # second compaction sweeps the generation: the snapshot now raises
    profile_index_ingest_batch(
        spark.createDataFrame(
            [(999999, "late addendum document", "en", "unit", 22)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long"),
        path, batch_id=3)
    compact_profile_index(spark, path)
    with pytest.raises(ValueError, match="retention window"):
        read_profile(spark, path, as_of_seq=seq_e1).collect()


def test_ingest_loop_co_maintains_profile(spark, tmp_path):
    """streaming_ingest_loop(profile_index_path=): the loop's dedup
    SURVIVORS extend the profile sketches in the same exactly-once
    epoch; the merged profile equals a from-scratch build over
    hist ∪ survivors."""
    from pyspark.sql import functions as F

    from graphlite_spark.operators.dedup import build_dedup_index
    from graphlite_spark.streaming.stateful import streaming_ingest_loop

    hist = spark.createDataFrame(
        [(i, f"w{i} common the be to of and that have "
             f"historical corpus text content number {i}")
         for i in range(4)],
        "doc_id long, text string")
    didx = str(tmp_path / "didx")
    pidx = str(tmp_path / "pidx")
    build_dedup_index(hist, didx, n=3, num_hashes=64, bands=8)
    build_profile_index(hist, pidx, by=None)

    body = ("the be to of and that have with plainly sufficient "
            "wordcount for the quality gate to admit this document "
            "alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau upsilon "
            "phi chi psi omega one two three four five six seven")
    batch = spark.createDataFrame(
        [(100, f"<html><body><p>{body} unique{100}</p></body></html>"),
         (101, f"<html><body><p>{body} unique{101}</p></body></html>"),
         # exact dup of 100's extracted text: must NOT reach the profile
         (102, f"<html><body><p>{body} unique{100}</p></body></html>")],
        "doc_id long, html string")
    surv = streaming_ingest_loop(
        batch, didx, checkpoint=str(tmp_path / "ckpt"),
        min_words=20, profile_index_path=pidx)
    surv_rows = surv.select("doc_id", "text").collect()
    assert sorted(r.doc_id for r in surv_rows) == [100, 101]
    scratch = str(tmp_path / "scratch")
    union = hist.unionByName(
        spark.createDataFrame([(r.doc_id, r.text) for r in surv_rows],
                              "doc_id long, text string"))
    build_profile_index(union, scratch, by=None)
    assert _rows(read_profile(spark, pidx)) == \
        _rows(read_profile(spark, scratch))
