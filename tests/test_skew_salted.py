"""Skew-salted shuffle paths (r11, VERDICT r10 ask #4): planted
hot keys — a viral gram block for span_dedup, a giant LSH bucket for
minhash_lsh_pairs — produce BIT-IDENTICAL outputs through the salted
paths, and the salted plans actually split the hot key across salt
partitions (the per-task bound the plain path lacks).
"""

from __future__ import annotations

import pytest

from graphlite_spark.operators.dedup import minhash_lsh_pairs, span_dedup


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def viral_corpus(spark):
    """60 docs: every doc embeds the SAME 12-token license block (the
    viral gram — each of its k-grams occurs 60 times), wrapped in
    per-doc unique prose so the docs are not whole-doc dups."""
    block = ("permission is hereby granted free of charge to any "
             "person obtaining")
    rows = [
        (i, f"doc {i} opens uniquely alpha{i} beta{i} . {block} . "
            f"then doc {i} closes with gamma{i} delta{i} distinct text")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_dedup_salted_identical_on_hot_gram(spark, viral_corpus):
    plain = _rows(span_dedup(viral_corpus, k=4))
    salted = _rows(span_dedup(viral_corpus, k=4, skew="salted", salt=8))
    assert salted == plain
    # the viral block really was removed everywhere (hot key exercised)
    assert all(r[2] > 0 for r in plain)  # n_removed > 0 per doc


def test_span_dedup_salted_identical_on_real_docs(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    plain = _rows(span_dedup(docs, k=8))
    salted = _rows(span_dedup(docs, k=8, skew="salted"))
    assert salted == plain


def test_span_dedup_rejects_unknown_skew(spark, viral_corpus):
    with pytest.raises(ValueError, match="skew must be"):
        span_dedup(viral_corpus, skew="sorted")


@pytest.fixture()
def hot_bucket_corpus(spark):
    """24 near-identical docs (one shared long body, one trailing
    unique word) — their signatures agree on most bands, so the
    band-bucket frame carries buckets of width ~24; plus 10 unrelated
    docs for cold-path coverage."""
    body = ("the shared boilerplate body repeats across every mirror "
            "page of the site with only the footer differing slightly "
            "over time in ways minhash mostly cannot see")
    rows = [(i, f"{body} footer{i % 3}") for i in range(24)]
    rows += [(100 + i,
              f"entirely unrelated document number {i} about topic{i} "
              f"with its own distinct vocabulary set{i} and phrasing{i}")
             for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_salted_identical_pairs(spark, hot_bucket_corpus):
    kw = dict(n=3, num_hashes=32, bands=8, threshold=0.5)
    plain = _rows(minhash_lsh_pairs(hot_bucket_corpus, **kw))
    salted = _rows(minhash_lsh_pairs(hot_bucket_corpus, skew="salted",
                                     hot_min=4, salt=8, **kw))
    assert salted == plain
    assert len(plain) >= 24 * 23 // 4  # the hot cluster really paired


def test_lsh_salted_identical_candidates_unverified(spark,
                                                    hot_bucket_corpus):
    kw = dict(n=3, num_hashes=32, bands=8, verify=False)
    plain = _rows(minhash_lsh_pairs(hot_bucket_corpus, **kw))
    salted = _rows(minhash_lsh_pairs(hot_bucket_corpus, skew="salted",
                                     hot_min=4, salt=4, **kw))
    assert salted == plain


def test_lsh_salted_identical_on_real_docs(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    plain = _rows(minhash_lsh_pairs(docs))
    # hot_min low enough that the planted near-dup buckets take the
    # salted branch on the real corpus too
    salted = _rows(minhash_lsh_pairs(docs, skew="salted", hot_min=2,
                                     salt=4))
    assert salted == plain


def test_salted_split_bounds_task_input(spark, viral_corpus):
    """The mechanism check: the salted semi-join's shuffle key space
    for the hot gram is `salt` distinct (gram, salt) pairs, not one —
    measured by the distinct salt values occurrence rows of the viral
    gram actually take."""
    from pyspark.sql import functions as F

    k, salt = 4, 8
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = viral_corpus.select(F.col("doc_id").alias("_id"), toks.alias("_t"))
    grams = base.select(
        "_id",
        F.expr(f"transform(sequence(0, size(_t) - {k}), "
               f"p -> concat_ws(' ', slice(_t, p + 1, {k})))").alias("_g"))
    occ = grams.select("_id", F.posexplode("_g").alias("_p", "_gram")) \
        .withColumn("_k", F.xxhash64("_gram")) \
        .withColumn("_salt", F.pmod(F.xxhash64("_id", "_p"),
                                    F.lit(salt)))
    hot_gram = "permission is hereby granted"
    got = (occ.filter(F.col("_gram") == hot_gram)
           .select("_salt").distinct().count())
    assert got == salt  # all 60 occurrences spread over every salt


# ---------------------------------------------------------------------------
# skew='auto' (r11): hybrid hot/cold split with broadcast hot probes
# ---------------------------------------------------------------------------

def test_span_dedup_auto_identical_on_hot_gram(spark, viral_corpus):
    """auto must equal plain on a planted hot gram (hot_min low
    enough that the viral block's grams take the broadcast branch)."""
    plain = _rows(span_dedup(viral_corpus, k=4))
    auto = _rows(span_dedup(viral_corpus, k=4, skew="auto",
                            hot_min=10))
    assert auto == plain
    assert all(r[2] > 0 for r in plain)


def test_span_dedup_auto_identical_when_nothing_hot(spark,
                                                    viral_corpus):
    """With hot_min above every gram count the hot slice is empty and
    auto degenerates to the plain join — same output."""
    plain = _rows(span_dedup(viral_corpus, k=4))
    auto = _rows(span_dedup(viral_corpus, k=4, skew="auto",
                            hot_min=10 ** 9))
    assert auto == plain


def test_span_dedup_auto_hot_branch_is_broadcast(spark, viral_corpus):
    """The hot slice's semi-join must probe a broadcast key set —
    the viral gram's occurrence rows never shuffle."""
    df = span_dedup(viral_corpus, k=4, skew="auto", hot_min=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final and "LeftSemi" in final, final


def test_lsh_auto_is_the_hybrid(spark, hot_bucket_corpus):
    kw = dict(n=2, num_hashes=16, bands=8, threshold=0.0)
    plain = _rows(minhash_lsh_pairs(hot_bucket_corpus, **kw))
    auto = _rows(minhash_lsh_pairs(hot_bucket_corpus, skew="auto",
                                   hot_min=4, salt=8, **kw))
    assert auto == plain
