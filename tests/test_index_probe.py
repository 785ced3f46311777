"""Broadcast-probe join posture for against-index reads
(operators/dedup.py: strategy='auto'|'broadcast'|'shuffle').

The plain ``batch semi-join index`` plan must shuffle the ENTIRE
index key tier every epoch (a LeftSemi join can only build on the
right, and the right is the index). The broadcast posture flips the
probe: the batch's distinct key set becomes the broadcast build side
and the index scan streams through a BroadcastHashJoin — the only
full pass over the index is the scan itself, no matter how large the
index grows. Results must be bit-identical across strategies.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _corpus(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"document number {i} body with shared words "
             f"{'common' if i % 3 == 0 else 'rare'}")
         for i in range(lo, hi)],
        "doc_id long, text string")


@pytest.fixture()
def built_index(spark, tmp_path):
    from graphlite_spark.operators.dedup import build_dedup_index

    path = str(tmp_path / "idx")
    build_dedup_index(_corpus(spark, 0, 150), path,
                      n=3, num_hashes=64, bands=16)
    return path


def test_against_index_parity_across_strategies(spark, built_index):
    from graphlite_spark.operators.dedup import dedup_against_index

    probe = _corpus(spark, 100, 200)  # 100..149 duplicate the index
    got = {}
    for s in ("broadcast", "shuffle", "auto"):
        got[s] = sorted(r.doc_id for r in dedup_against_index(
            probe, built_index, strategy=s).collect())
    assert got["broadcast"] == got["shuffle"] == got["auto"]
    # closed form without the near tier: exactly the fresh ids stay
    exact_only = {}
    for s in ("broadcast", "shuffle"):
        exact_only[s] = sorted(r.doc_id for r in dedup_against_index(
            probe, built_index, near=False, strategy=s).collect())
    assert exact_only["broadcast"] == exact_only["shuffle"]
    assert exact_only["shuffle"] == list(range(150, 200))


def test_against_index_flag_mode_parity(spark, built_index):
    from graphlite_spark.operators.dedup import dedup_against_index

    probe = _corpus(spark, 100, 160)
    got = {}
    for s in ("broadcast", "shuffle"):
        got[s] = sorted(
            (r.doc_id, r.exact_dup, r.near_dup)
            for r in dedup_against_index(
                probe, built_index, mode="flag", strategy=s).collect())
    assert got["broadcast"] == got["shuffle"]
    assert all(e for _, e, _ in got["shuffle"][:50])


def test_ingest_parity_and_identical_index_state(spark, tmp_path):
    """Both strategies must produce the same survivors AND leave the
    index with the same key set (the appended delta is derived from
    the survivors)."""
    from graphlite_spark.operators.dedup import (
        build_dedup_index,
        dedup_index_ingest_batch,
    )
    from graphlite_spark.operators.index_store import read_tier

    state = {}
    for s in ("broadcast", "shuffle"):
        p = str(tmp_path / f"ing-{s}")
        build_dedup_index(_corpus(spark, 0, 100), p,
                          n=3, num_hashes=64, bands=16)
        batch = _corpus(spark, 80, 180).unionByName(
            _corpus(spark, 0, 20).select(
                (F.col("doc_id") + 1000).alias("doc_id"), "text"))
        surv = dedup_index_ingest_batch(batch, p, batch_id=1,
                                        strategy=s)
        state[s] = (
            sorted(r.doc_id for r in surv.collect()),
            sorted(r.h for r in
                   read_tier(spark, p, "exact").collect()),
        )
    assert state["broadcast"] == state["shuffle"]
    surv_ids = state["shuffle"][0]
    # exact dups (80..99 and the shifted 1000+ copies) never survive;
    # the near tier may drop more, identically under both strategies
    assert set(surv_ids) <= set(range(100, 180))
    assert surv_ids, "some fresh docs must survive"


def test_bad_strategy_raises(spark, built_index):
    from graphlite_spark.operators.dedup import dedup_against_index

    with pytest.raises(ValueError, match="strategy"):
        dedup_against_index(_corpus(spark, 0, 5), built_index,
                            strategy="bloom").collect()


def test_broadcast_probe_plan_never_shuffles_the_index(
        spark, built_index):
    """The index-side join in the broadcast posture must be a
    BroadcastHashJoin with the index scan as the streamed side — no
    SortMergeJoin, and the only hash-partitioning exchange in the
    probe is the batch key set's own distinct."""
    from graphlite_spark.operators.dedup import (
        _index_hits,
        _index_tier,
    )

    probe_keys = (_corpus(spark, 100, 200)
                  .select(F.xxhash64(F.lower(F.trim(F.col("text"))))
                          .alias("h")).distinct())
    idx = _index_tier(spark, built_index, "exact", None)
    hits = _index_hits(idx.select("h"), probe_keys, ["h"])
    hits.collect()
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # one Exchange total in the executed plan (AQE's toString repeats
    # the tree as "Initial Plan" — look at the final section only):
    # the probe side's distinct; the index branch reaches the join
    # straight from its scan
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 1, final


# ---------------------------------------------------------------------------
# strategy='pushdown' (point probes) + key-range base layout
# ---------------------------------------------------------------------------

def test_pushdown_parity_and_auto_selection(spark, built_index):
    from graphlite_spark.operators.dedup import dedup_against_index

    probe = _corpus(spark, 140, 160)  # 10 dups, 10 fresh
    got = {}
    for s in ("pushdown", "shuffle"):
        got[s] = sorted(r.doc_id for r in dedup_against_index(
            probe, built_index, near=False, strategy=s).collect())
    assert got["pushdown"] == got["shuffle"] == list(range(150, 160))
    # auto resolves a point-probe-sized batch to the same answer
    auto = sorted(r.doc_id for r in dedup_against_index(
        probe, built_index, near=False, strategy="auto").collect())
    assert auto == got["shuffle"]


def test_pushdown_over_cap_raises(spark, built_index):
    from graphlite_spark.operators.dedup import dedup_against_index

    with pytest.raises(ValueError, match="pushdown_max_keys"):
        dedup_against_index(_corpus(spark, 0, 50), built_index,
                            near=False, strategy="pushdown",
                            pushdown_max_keys=10).collect()


def test_pushdown_probe_reaches_the_parquet_scan(spark, built_index):
    """The point-probe plan must show the IN predicate as a
    PushedFilters entry on the index scan — with the key-range base
    layout that's a footer-level file skip, not a post-scan
    filter."""
    from graphlite_spark.operators.dedup import dedup_against_index

    probe = _corpus(spark, 140, 150)
    df = dedup_against_index(probe, built_index, near=False,
                             strategy="pushdown")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [seg for seg in plan.split("PushedFilters: ")[1:]
              if seg.startswith("[In(h")]
    assert pushed, plan


def test_ingest_pushdown_parity(spark, tmp_path):
    """A trickle epoch (under the pushdown cap) through ingest: same
    survivors and index state as the shuffle posture."""
    from graphlite_spark.operators.dedup import (
        build_dedup_index,
        dedup_index_ingest_batch,
    )
    from graphlite_spark.operators.index_store import read_tier

    state = {}
    for s in ("pushdown", "shuffle"):
        p = str(tmp_path / f"tr-{s}")
        build_dedup_index(_corpus(spark, 0, 100), p,
                          n=3, num_hashes=64, bands=16)
        surv = dedup_index_ingest_batch(
            _corpus(spark, 95, 105), p, batch_id=1, near=False,
            strategy=s)
        state[s] = (
            sorted(r.doc_id for r in surv.collect()),
            sorted(r.h for r in read_tier(spark, p, "exact").collect()),
        )
    assert state["pushdown"] == state["shuffle"]
    assert state["shuffle"][0] == list(range(100, 105))


def test_range_by_layout_files_are_key_disjoint(spark, tmp_path):
    """write_parquet_sized(range_by=): each output file covers a
    narrow, disjoint key range (footer min/max actually prune)."""
    import pyarrow.parquet as pq
    import os

    from graphlite_spark.sources.sinks import write_parquet_sized

    d = str(tmp_path / "ranged")
    df = spark.range(100000).selectExpr("xxhash64(id) AS h")
    # force several files by a tiny target
    write_parquet_sized(df, d, target_mb=1, range_by=["h"],
                        compression_ratio=0.1)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) >= 2
    ranges = []
    for f in files:
        md = pq.ParquetFile(os.path.join(d, f)).metadata
        mins = [md.row_group(i).column(0).statistics.min
                for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(0).statistics.max
                for i in range(md.num_row_groups)]
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges


def test_range_by_mutually_exclusive(spark, tmp_path):
    from graphlite_spark.sources.sinks import write_parquet_sized

    with pytest.raises(ValueError, match="mutually exclusive"):
        write_parquet_sized(spark.range(5), str(tmp_path / "x"),
                            range_by=["id"], sort_by=["id"])


# ---------------------------------------------------------------------------
# review fixes (r11): pushdown+near, salt validation, ranged fallback
# ---------------------------------------------------------------------------

def test_pushdown_with_near_maps_bands_to_broadcast(spark, built_index):
    """Explicit strategy='pushdown' with near=True must NOT trip the
    exact tier's pushdown cap on the ~bands-times larger bucket key
    set — the bands tier maps to the broadcast probe instead."""
    from graphlite_spark.operators.dedup import dedup_against_index

    probe = _corpus(spark, 140, 160)  # 20 docs -> ~320 band keys
    push = sorted(r.doc_id for r in dedup_against_index(
        probe, built_index, near=True, strategy="pushdown").collect())
    plain = sorted(r.doc_id for r in dedup_against_index(
        probe, built_index, near=True, strategy="shuffle").collect())
    assert push == plain


def test_salt_zero_raises_instead_of_silent_noop(spark):
    from graphlite_spark.operators.dedup import (
        minhash_lsh_pairs,
        span_dedup,
    )

    docs = _corpus(spark, 0, 10)
    with pytest.raises(ValueError, match="salt must be"):
        span_dedup(docs, k=4, skew="salted", salt=0)
    with pytest.raises(ValueError, match="salt must be"):
        minhash_lsh_pairs(docs, skew="salted", salt=0)


def test_range_by_holds_without_a_size_estimate(spark, tmp_path):
    """An RDD-backed frame (sc.parallelize) has no size estimate
    (LogicalRDD defaults to Long.Max); range_by must still produce
    disjoint per-file key ranges (the pushdown contract), falling
    back to the current partition count."""
    import os

    import pyarrow.parquet as pq

    from graphlite_spark.operators.dedup import _plan_size_bytes
    from graphlite_spark.sources.sinks import write_parquet_sized

    d = str(tmp_path / "ranged-noest")
    rdd = spark.sparkContext.parallelize(
        [(hash(str(i)) * 2654435761 % (1 << 61),) for i in range(20000)],
        4)
    df = spark.createDataFrame(rdd, "h long")
    assert _plan_size_bytes(df) >= 1 << 59  # premise: no estimate
    write_parquet_sized(df, d, target_mb=1, range_by=["h"])
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) >= 2
    ranges = []
    for f in files:
        md = pq.ParquetFile(os.path.join(d, f)).metadata
        st = [md.row_group(i).column(0).statistics
              for i in range(md.num_row_groups)]
        if st:
            ranges.append((min(s.min for s in st),
                           max(s.max for s in st)))
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges


def test_publish_race_nested_rename_is_recovered(spark, tmp_path,
                                                 monkeypatch):
    """Hadoop rename moves a source dir INTO an existing destination
    dir and returns true. Simulate an interloper winning the
    exists-check -> rename window: the loser must detect the nesting,
    extract its staged write, verify it equal, and leave the
    partition exactly as the winner committed it."""
    from graphlite_spark.operators import index_store
    from graphlite_spark.operators.dedup import build_dedup_index

    path = str(tmp_path / "idx")
    build_dedup_index(_corpus(spark, 0, 5), path,
                      n=3, num_hashes=64, bands=16)
    df = spark.createDataFrame([(11,), (22,)], "h long")

    real_fault = index_store._fault_point
    fired = {"n": 0}

    def interloper(label):
        if label == "publish:rename:exact" and fired["n"] == 0:
            fired["n"] = 1
            # the winner commits the same partition content first
            index_store.publish_delta(spark, path, "exact", df, 1)
        return real_fault(label)

    monkeypatch.setattr(index_store, "_fault_point", interloper)
    index_store.publish_delta(spark, path, "exact", df, 1)
    got = sorted(r.h for r in
                 spark.read.parquet(f"{path}/exact_delta").collect())
    assert got == [11, 22]
    # no nested directory survived inside the partition
    import os

    part = f"{path}/exact_delta/_batch_id=1"
    assert all(not os.path.isdir(os.path.join(part, e))
               for e in os.listdir(part))


def test_publish_race_nested_different_data_raises(spark, tmp_path,
                                                   monkeypatch):
    from graphlite_spark.operators import index_store
    from graphlite_spark.operators.dedup import build_dedup_index

    path = str(tmp_path / "idx")
    build_dedup_index(_corpus(spark, 0, 5), path,
                      n=3, num_hashes=64, bands=16)

    real_fault = index_store._fault_point
    fired = {"n": 0}

    def interloper(label):
        if label == "publish:rename:exact" and fired["n"] == 0:
            fired["n"] = 1
            index_store.publish_delta(
                spark, path, "exact",
                spark.createDataFrame([(99,)], "h long"), 1)
        return real_fault(label)

    monkeypatch.setattr(index_store, "_fault_point", interloper)
    with pytest.raises(ValueError, match="conflicting delta partition"):
        index_store.publish_delta(
            spark, path, "exact",
            spark.createDataFrame([(11,)], "h long"), 1)
    # winner's rows intact, loser's gone
    got = [r.h for r in
           spark.read.parquet(f"{path}/exact_delta").collect()]
    assert got == [99]


def test_read_meta_row_matches_spark_read(spark, tmp_path):
    """read_meta_row (the driver-side pyarrow footer read) must return
    the same values as the authoritative Spark read, support BOTH
    attribute and item access like a Row, and resolve a COMPACTED
    (versioned) meta tier through the manifest like read_base."""
    from graphlite_spark.operators.dedup import build_dedup_index
    from graphlite_spark.operators.index_store import read_meta_row

    path = str(tmp_path / "idx")
    build_dedup_index(_corpus(spark, 0, 30), path,
                      n=3, num_hashes=64, bands=16)
    fast = read_meta_row(spark, path)
    ref = spark.read.parquet(f"{path}/meta").collect()[0]
    for f in ref.__fields__:
        assert fast[f] == ref[f]
        assert getattr(fast, f) == getattr(ref, f)

    # ANN family: meta IS a manifest-mapped tier that compaction
    # versions — the fast read must follow the mapping
    import numpy as np

    from graphlite_spark.operators.similarity import (
        ann_index_ingest_batch,
        build_rescore_index,
        compact_ann_index,
    )

    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(8)]) for i in range(20)],
        "vec_id long, embedding array<double>")
    apath = str(tmp_path / "ann")
    build_rescore_index(emb, apath, bits=8)
    ann_index_ingest_batch(
        spark.createDataFrame(
            [(100 + i, [float(x) for x in rng.randn(8)])
             for i in range(5)],
            "vec_id long, embedding array<double>"),
        apath, batch_id=1)
    compact_ann_index(spark, apath)
    fast2 = read_meta_row(spark, apath)
    ref2 = spark.read.parquet(f"{apath}/meta_v2").collect()[0]
    assert int(fast2["n_items"]) == int(ref2["n_items"]) == 25
    assert int(fast2.bits) == 8


def test_probe_strategy_lazy_keys_not_built_for_small_index(spark,
                                                            tmp_path):
    """strategy='auto' over a small index must resolve to the plain
    plan WITHOUT constructing the probe key set (building a lazily-
    checkpointed frame pays full physical planning up front)."""
    from graphlite_spark.operators.dedup import (
        _probe_strategy,
        build_dedup_index,
        _index_tier,
    )

    path = str(tmp_path / "idx")
    build_dedup_index(_corpus(spark, 0, 10), path,
                      n=3, num_hashes=64, bands=16)
    idx = _index_tier(spark, path, "exact", None)
    calls = {"n": 0}

    def make_keys():
        calls["n"] += 1
        return _corpus(spark, 0, 5).select("doc_id")

    assert _probe_strategy(make_keys, "auto", 8_000_000,
                           idx=idx) == "shuffle"
    assert calls["n"] == 0
    # explicit pushdown still counts (and builds) the key set
    assert _probe_strategy(make_keys, "pushdown", 8_000_000,
                           idx=idx) == "pushdown"
    assert calls["n"] == 1
