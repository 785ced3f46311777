"""Sketch-family tests: accuracy bounds, mergeability, determinism,
and pure-python / DuckDB replica parity of the hash arithmetic."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphlite_spark.operators import sketches as sk

M32 = 1 << 32


def py_mix32(key: int, salt: int) -> int:
    h = (key % M32 + salt) % M32
    h ^= h >> 16
    h = (h * 0x85EBCA6B) % M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) % M32
    return h ^ (h >> 16)


def py_km(key: int, salt: int, count: int, modulus: int) -> list[int]:
    h1 = py_mix32(key, salt)
    h2 = py_mix32(key, salt + sk._SALT_STEP)
    return [((h1 + j * (2 * h2 + 1)) % M32) % modulus for j in range(count)]


TRICKY_KEYS = [0, 1, 2, 13, 999, 65535, 65536, 2**31, 2**32 - 1,
               2**63 - 1, -5, -(2**31)]


@pytest.fixture(scope="module")
def tricky(spark):
    return spark.createDataFrame([(k,) for k in TRICKY_KEYS], "k: long")


def test_mix32_python_replica(tricky):
    got = [r[0] for r in tricky.select(sk._mix32(F.col("k"), 7)).collect()]
    assert got == [py_mix32(k, 7) for k in TRICKY_KEYS]


def test_mix32_sql_mirror(tricky):
    import duckdb

    got = [r[0] for r in tricky.select(sk._mix32(F.col("k"), 7)).collect()]
    con = duckdb.connect()
    sql = [con.execute(f"select {sk.mix32_sql(str(k), 7)}").fetchone()[0]
           for k in TRICKY_KEYS]
    assert got == sql


def test_km_positions_replicas(tricky):
    import duckdb

    got = [tuple(r) for r in
           tricky.select(*sk._km_positions(F.col("k"), 3, 4, 1024)).collect()]
    assert got == [tuple(py_km(k, 3, 4, 1024)) for k in TRICKY_KEYS]
    con = duckdb.connect()
    sql = [tuple(
        con.execute(f"select {sk.km_positions_sql(str(k), 3, j, 1024)}")
        .fetchone()[0] for j in range(4)) for k in TRICKY_KEYS]
    assert got == sql


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_accuracy_and_python_registers(spark):
    n = 20000
    df = spark.range(0, n).select((F.col("id") * 7 + 3).alias("k"))
    est = sk.hll_count_distinct(df, "k", p=12).collect()[0]["estimate"]
    assert abs(est - n) / n < 0.05  # 3 sigma at p=12 is ~4.8%

    # register frame == pure-python HLL on a small set
    small = spark.createDataFrame([(k,) for k in range(500)], "k: long")
    got = {(r["register"], r["rho"])
           for r in sk.hll_sketch(small, "k", p=8, salt=3).collect()}
    regs: dict[int, int] = {}
    for k in range(500):
        h = py_mix32(k, 3)
        reg, rem = h >> 24, h % (1 << 24)
        rho = 25 - rem.bit_length() if rem else 25
        regs[reg] = max(regs.get(reg, 0), rho)
    assert got == set(regs.items())


def test_hll_duplicate_and_partition_insensitive(spark):
    df = spark.range(0, 5000).select((F.col("id") % 1000).alias("k"))
    a = sk.hll_count_distinct(df, "k", p=10).collect()[0]["estimate"]
    b = sk.hll_count_distinct(df.repartition(13), "k", p=10) \
        .collect()[0]["estimate"]
    c = sk.hll_count_distinct(df.unionByName(df), "k", p=10) \
        .collect()[0]["estimate"]
    assert a == b == c
    assert abs(a - 1000) / 1000 < 0.12  # p=10 -> ~3.3% sigma


def test_hll_merge_equals_whole(spark):
    df = spark.range(0, 8000).select((F.col("id") * 11).alias("k"),
                                     (F.col("id") % 4).alias("g"))
    parts = [sk.hll_sketch(df.where(F.col("k") % 3 == i), "k", ("g",), p=9)
             for i in range(3)]
    merged = sk.hll_estimate(
        sk.hll_merge(*parts, group_cols=("g",)), 9, ("g",))
    whole = sk.hll_estimate(sk.hll_sketch(df, "k", ("g",), p=9), 9, ("g",))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_hll_small_range_linear_counting(spark):
    # tiny cardinality vs m=4096 registers -> the linear-counting branch
    df = spark.createDataFrame([(k,) for k in range(30)], "k: long")
    est = sk.hll_count_distinct(df, "k", p=12).collect()[0]["estimate"]
    assert abs(est - 30) < 2


def test_hll_p_validation(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="p must be"):
        sk.hll_sketch(df, "k", p=3)
    with pytest.raises(ValueError, match="p must be"):
        sk.hll_sketch(df, "k", p=19)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def test_cms_overestimates_and_is_tight_when_sparse(spark):
    df = spark.range(0, 9000).select((F.col("id") % 90).alias("k"))
    sketch = sk.cms_sketch(df, "k", depth=4, width=1024, salt=5)
    probes = spark.range(0, 90).select(F.col("id").alias("k"))
    got = {r["k"]: r["estimate"]
           for r in sk.cms_query(sketch, probes, "k", depth=4, width=1024,
                                 salt=5).collect()}
    # 90 keys in 1024 buckets and a 4-row min: collisions vanish
    assert all(v == 100 for v in got.values())
    # absent key may only OVERestimate (never negative, never missing)
    absent = spark.createDataFrame([(123456,)], "k: long")
    est = sk.cms_query(sketch, absent, "k", depth=4, width=1024,
                       salt=5).collect()[0]["estimate"]
    assert est >= 0


def test_cms_merge_is_additive(spark):
    df = spark.range(0, 2000).select((F.col("id") % 40).alias("k"))
    s1 = sk.cms_sketch(df.where("k < 20"), "k", width=256, salt=1)
    s2 = sk.cms_sketch(df.where("k >= 20"), "k", width=256, salt=1)
    merged = sk.cms_merge(s1, s2)
    whole = sk.cms_sketch(df, "k", width=256, salt=1)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_cms_weighted(spark):
    df = spark.createDataFrame([(1, 5), (1, 7), (2, 10)], "k: long, w: long")
    sketch = sk.cms_sketch(df, "k", depth=3, width=64, weight_col="w")
    probes = spark.createDataFrame([(1,), (2,)], "k: long")
    got = {r["k"]: r["estimate"]
           for r in sk.cms_query(sketch, probes, "k", depth=3,
                                 width=64).collect()}
    assert got[1] >= 12 and got[2] >= 10  # min-overestimate property


def test_cms_validation(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="depth"):
        sk.cms_sketch(df, "k", depth=0)
    with pytest.raises(ValueError, match="power of two"):
        sk.cms_sketch(df, "k", width=100)


# ---------------------------------------------------------------------------
# DDSketch
# ---------------------------------------------------------------------------

def test_dd_quantile_relative_error_bound(spark):
    vals = spark.range(1, 20001).select(
        F.pow(F.lit(1.001), F.col("id") % 5000).alias("v"))
    truth = sorted(1.001 ** (i % 5000) for i in range(1, 20001))
    sketch = sk.dd_sketch(vals, "v", alpha=0.02)
    for q, est in [(r["q"], r["estimate"]) for r in
                   sk.dd_quantile(sketch, [0.01, 0.5, 0.99],
                                  alpha=0.02).collect()]:
        true = truth[math.floor(q * (len(truth) - 1))]
        assert abs(est - true) / true <= 0.02 + 1e-9, (q, est, true)


def test_dd_merge_equals_whole(spark):
    vals = spark.range(1, 5001).select(F.col("id").cast("double").alias("v"))
    s1 = sk.dd_sketch(vals.where("v <= 2500"), "v", alpha=0.01)
    s2 = sk.dd_sketch(vals.where("v > 2500"), "v", alpha=0.01)
    merged = sk.dd_quantile(sk.dd_merge(s1, s2), [0.5], alpha=0.01)
    whole = sk.dd_quantile(sk.dd_sketch(vals, "v", alpha=0.01), [0.5],
                           alpha=0.01)
    assert merged.collect() == whole.collect()


def test_dd_nonpositive_policies(spark):
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame([(1.0,), (0.0,), (4.0,)], "v: double")
    with pytest.raises(Exception) as ei:
        sk.dd_sketch(df, "v").collect()
    assert "nonpositive" in str(ei.value)
    kept = sk.dd_sketch(df, "v", on_nonpositive="drop")
    assert kept.agg(F.sum("cnt")).collect()[0][0] == 2
    with pytest.raises(ValueError, match="on_nonpositive"):
        sk.dd_sketch(df, "v", on_nonpositive="ignore")


def test_dd_validation(spark):
    df = spark.createDataFrame([(1.0,)], "v: double")
    with pytest.raises(ValueError, match="alpha"):
        sk.dd_sketch(df, "v", alpha=1.5)
    with pytest.raises(ValueError, match="quantile"):
        sk.dd_quantile(sk.dd_sketch(df, "v"), [1.5])


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fp_near_theory(spark):
    keys = spark.range(0, 2000).select((F.col("id") * 13 + 1).alias("k"))
    big = spark.range(0, 60000).select(F.col("id").alias("k"))
    kept = sk.bloom_filter_join(big, keys, "k", num_bits=1 << 15, k=4,
                                salt=2)
    kept_ids = {r["k"] for r in kept.collect()}
    member_ids = {r["k"] for r in big.join(keys, "k", "left_semi").collect()}
    assert member_ids <= kept_ids  # NO false negatives, ever
    # fp rate near (1 - e^{-kn/m})^k ~ 0.55% here; allow 3x slack
    fp = len(kept_ids - member_ids)
    n_non = 60000 - len(member_ids)
    theory = (1 - math.exp(-4 * 2000 / (1 << 15))) ** 4
    assert fp / n_non < 3 * theory + 1e-4, (fp, n_non, theory)


def test_bloom_words_mergeable_and_partition_insensitive(spark):
    keys = spark.range(0, 500).select((F.col("id") * 3).alias("k"))
    whole = sk.bloom_words(keys, "k", num_bits=1 << 12, k=3, salt=9)
    a = sk.bloom_words(keys.where("k % 2 = 0"), "k", 1 << 12, 3, 9)
    b = sk.bloom_words(keys.where("k % 2 = 1"), "k", 1 << 12, 3, 9)
    merged = (a.unionByName(b).groupBy("word")
              .agg(F.bit_or("bits").alias("bits")))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))
    rep = sk.bloom_words(keys.repartition(7), "k", 1 << 12, 3, 9)
    assert sorted(map(tuple, rep.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_bloom_validation(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="power of two"):
        sk.bloom_words(df, "k", num_bits=1000)
    with pytest.raises(ValueError, match="k must be"):
        sk.bloom_words(df, "k", num_bits=1 << 10, k=0)


# ---------------------------------------------------------------------------
# Theta / KMV
# ---------------------------------------------------------------------------

def test_theta_estimate_and_setops(spark):
    A = spark.range(0, 10000).select(F.col("id").alias("k"))
    B = spark.range(5000, 15000).select(F.col("id").alias("k"))
    sa = sk.theta_sketch(A, "k", k=512, salt=3)
    sb = sk.theta_sketch(B, "k", k=512, salt=3)
    ea = sk.theta_estimate(sa, 512).collect()[0]["estimate"]
    assert abs(ea - 10000) / 10000 < 0.15  # ~3 sigma at k=512
    r = sk.theta_intersect_estimate(sa, sb, 512).collect()[0]
    assert abs(r["est_intersection"] - 5000) / 5000 < 0.2
    eu = sk.theta_estimate(sk.theta_union(sa, sb, k=512), 512) \
        .collect()[0]["estimate"]
    assert abs(eu - 15000) / 15000 < 0.15


def test_theta_exact_below_k_and_disjoint(spark):
    S = spark.range(0, 100).select(F.col("id").alias("k"))
    ss = sk.theta_sketch(S, "k", k=512, salt=3)
    assert sk.theta_estimate(ss, 512).collect()[0]["estimate"] == 100.0
    # two exact sides -> EXACT intersection count
    T = spark.range(60, 160).select(F.col("id").alias("k"))
    st = sk.theta_sketch(T, "k", k=512, salt=3)
    r = sk.theta_intersect_estimate(ss, st, 512).collect()[0]
    assert (r["est_a"], r["est_b"], r["est_intersection"]) == \
        (100.0, 100.0, 40.0)
    # disjoint sides -> 0.0, group still present in the output
    C = spark.range(20000, 30000).select(F.col("id").alias("k"))
    sc = sk.theta_sketch(C, "k", k=512, salt=3)
    r2 = sk.theta_intersect_estimate(
        sk.theta_sketch(spark.range(0, 10000)
                        .select(F.col("id").alias("k")), "k", k=512,
                        salt=3), sc, 512).collect()
    assert len(r2) == 1 and r2[0]["est_intersection"] == 0.0


def test_theta_partition_and_duplicate_insensitive(spark):
    A = spark.range(0, 5000).select((F.col("id") % 800).alias("k"))
    s1 = sorted(r.h for r in sk.theta_sketch(A, "k", k=256, salt=1).collect())
    s2 = sorted(r.h for r in
                sk.theta_sketch(A.repartition(13), "k", k=256,
                                salt=1).collect())
    s3 = sorted(r.h for r in
                sk.theta_sketch(A.unionByName(A), "k", k=256,
                                salt=1).collect())
    assert s1 == s2 == s3 and len(s1) == 256


def test_theta_validation(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="k must be"):
        sk.theta_sketch(df, "k", k=8)


def test_dd_clamp_winsorizes(spark):
    vals = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    out = sk.dd_clamp(vals, "v", lo_q=0.1, hi_q=0.9, alpha=0.01)
    rows = out.collect()
    lo_ct = sum(1 for r in rows if r["_clamped_lo"])
    hi_ct = sum(1 for r in rows if r["_clamped_hi"])
    # ~10% trimmed each side (alpha slack)
    assert 80 <= lo_ct <= 120 and 80 <= hi_ct <= 120
    # clamped column is bounded and untouched in the middle
    los = [r["v_clamped"] for r in rows if r["_clamped_lo"]]
    assert len(set(los)) == 1  # everything below lo maps to ONE bound
    mid = [r for r in rows if not r["_clamped_lo"] and not r["_clamped_hi"]]
    assert all(r["v_clamped"] == r["v"] for r in mid)
    # bound within alpha of the true quantile
    true_lo = 1 + 0.1 * 999
    assert abs(los[0] - true_lo) / true_lo < 0.02
    with pytest.raises(ValueError, match="lo_q"):
        sk.dd_clamp(vals, "v", lo_q=0.9, hi_q=0.1)


def test_theta_key_named_h(spark):
    # the hash column is named 'h' — a key column with the same name
    # must not produce a duplicate-name frame
    df = spark.range(0, 200).select(F.col("id").alias("h"))
    s = sk.theta_sketch(df, "h", k=64, salt=1)
    assert s.columns == ["h"] and s.count() == 64
    with pytest.raises(ValueError, match="named 'h'"):
        sk.theta_sketch(df.withColumn("g", F.lit(1)), "h",
                        group_cols=("h",), k=64)


# ---------------------------------------------------------------------------
# Priority sampling (DLT)
# ---------------------------------------------------------------------------

def _py_priority(ws: dict, n: int, salt: int):
    """Pure-python DLT replica: kept {key: w_hat}."""
    qs = sorted(((w / ((py_mix32(k, salt) + 0.5) / M32), k, w)
                 for k, w in ws.items()), key=lambda t: (-t[0], t[1]))
    tau = qs[n][0] if len(qs) > n else 0.0
    return {k: max(w, tau) for _, k, w in qs[:n]}


def test_priority_sample_replica_parity(spark):
    from graphlite_spark.operators.sampling import priority_sample

    ws = {i: float(1 + (i * 7) % 13) for i in range(100)}
    df = spark.createDataFrame(list(ws.items()), "doc_id: long, w: double")
    for salt in (0, 9):
        got = {r["doc_id"]: r["weight_est"]
               for r in priority_sample(df, "w", 20, "doc_id",
                                        salt=salt).collect()}
        assert got == _py_priority(ws, 20, salt)
    # partition insensitivity
    a = sorted(map(tuple, priority_sample(df, "w", 10, "doc_id",
                                          salt=3).collect()))
    b = sorted(map(tuple,
                   priority_sample(df.repartition(13), "w", 10, "doc_id",
                                   salt=3).collect()))
    assert a == b


def test_priority_sample_exact_and_grouped(spark):
    from graphlite_spark.operators.sampling import priority_sample

    small = spark.createDataFrame([(i, 2.0, i % 2) for i in range(6)],
                                  "doc_id: long, w: double, g: int")
    out = priority_sample(small, "w", 10, "doc_id",
                          group_cols=("g",)).collect()
    # both groups fit entirely -> exact weights, all rows kept
    assert len(out) == 6 and all(r["weight_est"] == 2.0 for r in out)
    big = spark.createDataFrame(
        [(i, float(i + 1), i % 2) for i in range(40)],
        "doc_id: long, w: double, g: int")
    kept = priority_sample(big, "w", 5, "doc_id",
                           group_cols=("g",)).collect()
    assert len(kept) == 10
    assert {r["g"] for r in kept} == {0, 1}


def test_priority_sample_estimator_converges():
    # the DLT subset-sum estimator, averaged over MANY salts of the
    # deterministic hash u, converges to the true total (skewed
    # distribution: slow from below, hence 3000 draws)
    ws = {i: float(1 + (i * 7) % 13) for i in range(100)}
    true_total = sum(ws.values())
    tot = 0.0
    for salt in range(3000):
        tot += sum(_py_priority(ws, 20, salt).values())
    assert abs(tot / 3000 - true_total) / true_total < 0.03


def test_priority_sample_validation(spark):
    from graphlite_spark.operators.sampling import priority_sample

    df = spark.createDataFrame([(1, 0.0)], "doc_id: long, w: double")
    with pytest.raises(ValueError, match="n must be"):
        priority_sample(df, "w", 0, "doc_id")
    with pytest.raises(Exception) as ei:
        priority_sample(df, "w", 5, "doc_id").collect()
    assert "nonpositive" in str(ei.value)
    assert priority_sample(df, "w", 5, "doc_id",
                           on_nonpositive="drop").count() == 0


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

def test_zorder_interleave_replica(spark):
    from graphlite_spark.operators.layout import zorder_value

    df = spark.createDataFrame(
        [(i, float(i % 7), float((i * 3) % 5)) for i in range(50)],
        "id: long, x: double, y: double")
    got = {r["id"]: r["_z"] for r in
           zorder_value(df, ["x", "y"], bits=4,
                        bounds={"x": (0, 6), "y": (0, 4)}).collect()}

    def interleave(bx, by):
        z = 0
        for b in range(4):
            z |= ((bx >> b) & 1) << (2 * b)
            z |= ((by >> b) & 1) << (2 * b + 1)
        return z

    for i in range(50):
        x, y = i % 7, (i * 3) % 5
        bx = min(15, int(x / 6 * 16))
        by = min(15, int(y / 4 * 16))
        assert got[i] == interleave(bx, by), (i, x, y)


def test_zorder_pruning_beats_single_sort(spark, tmp_path):
    import os

    import pyarrow.parquet as pq

    from graphlite_spark.operators.layout import zorder_repartition

    df = spark.range(0, 40000).select(
        (F.col("id") % 317).cast("double").alias("x"),
        ((F.col("id") * 7919) % 293).cast("double").alias("y"))
    zp, lp = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_repartition(df, ["x", "y"], 32, bits=10) \
        .write.mode("overwrite").parquet(zp)
    df.repartitionByRange(32, "x").sortWithinPartitions("x") \
        .write.mode("overwrite").parquet(lp)

    def touched(path, xr, yr):
        hit = tot = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            for rg in range(md.num_row_groups):
                st = {md.row_group(rg).column(i).path_in_schema:
                      md.row_group(rg).column(i).statistics
                      for i in range(md.row_group(rg).num_columns)}
                tot += 1
                if (st["x"].min <= xr[1] and st["x"].max >= xr[0]
                        and st["y"].min <= yr[1] and st["y"].max >= yr[0]):
                    hit += 1
        return hit, tot

    # the z-order claim: a predicate on the column the single sort
    # IGNORES still prunes — linear-by-x reads everything
    zh, zt = touched(zp, (0.0, 316.0), (100.0, 120.0))
    lh, lt = touched(lp, (0.0, 316.0), (100.0, 120.0))
    assert lh == lt  # x-sort: zero pruning on y
    assert zh <= zt // 2, (zh, zt)  # z-order: at least half pruned


def test_zorder_validation(spark):
    from graphlite_spark.operators.layout import zorder_value

    df = spark.createDataFrame([(1.0,)], "x: double")
    with pytest.raises(ValueError, match="<= 63"):
        zorder_value(df, ["x"], bits=64)
    with pytest.raises(ValueError, match="bounds missing"):
        zorder_value(df, ["x"], bounds={})
    # constant column -> bucket 0 everywhere, no NaN
    const = spark.createDataFrame([(2.0, float(i)) for i in range(4)],
                                  "x: double, y: double")
    zs = zorder_value(const, ["x", "y"], bits=4)
    assert zs.where(F.col("_z").isNull()).count() == 0


def test_theta_jaccard_and_union(spark):
    A = spark.range(0, 8000).select(F.col("id").alias("k"))
    B = spark.range(4000, 12000).select(F.col("id").alias("k"))
    sa = sk.theta_sketch(A, "k", k=512, salt=3)
    sb = sk.theta_sketch(B, "k", k=512, salt=3)
    r = sk.theta_intersect_estimate(sa, sb, 512).collect()[0]
    # true: |A|=|B|=8000, inter 4000, union 12000, J = 1/3
    assert abs(r["est_union"] - 12000) / 12000 < 0.15
    assert abs(r["jaccard"] - 1 / 3) < 0.1
    # exact sides give exact everything
    S = spark.range(0, 60).select(F.col("id").alias("k"))
    T = spark.range(30, 90).select(F.col("id").alias("k"))
    r2 = sk.theta_intersect_estimate(
        sk.theta_sketch(S, "k", k=512, salt=3),
        sk.theta_sketch(T, "k", k=512, salt=3), 512).collect()[0]
    assert (r2["est_union"], r2["jaccard"]) == (90.0, round(30 / 90, 4))


# ---------------------------------------------------------------------------
# Reciprocal Rank Fusion
# ---------------------------------------------------------------------------

def test_rrf_fuse_hybrid(spark):
    from graphlite_spark.operators.similarity import rrf_fuse

    # lexical list ranks 1,2,3 = docs 10,20,30; dense ranks 30,40,10
    lex = spark.createDataFrame(
        [(10, 9.0), (20, 5.0), (30, 1.0)], "doc_id: long, score: double")
    den = spark.createDataFrame(
        [(30, 0.9), (40, 0.8), (10, 0.7)], "doc_id: long, score: double")
    got = {r["doc_id"]: (r["fused_score"], r["n_lists"])
           for r in rrf_fuse([lex, den], k=60).collect()}
    assert got[10] == (round(1 / 61 + 1 / 63, 6), 2)
    assert got[30] == (round(1 / 63 + 1 / 61, 6), 2)
    assert got[20] == (round(1 / 62, 6), 1)
    assert got[40] == (round(1 / 62, 6), 1)
    # doc in both lists outranks single-list docs; scale invariance
    top = rrf_fuse([lex, den], k=60, topk=2).collect()
    assert {r["doc_id"] for r in top} == {10, 30}
    lex2 = lex.select("doc_id", (F.col("score") * 1000 + 5).alias("score"))
    got2 = {r["doc_id"]: r["fused_score"]
            for r in rrf_fuse([lex2, den], k=60).collect()}
    assert got2 == {d: s for d, (s, _) in got.items()}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least 2"):
        rrf_fuse([lex])


def test_rrf_hybrid_search_end_to_end(spark):
    """The composition rrf_fuse exists for: BM25 lexical + dense
    cosine retrieval over the REAL documents/embeddings tables (ids
    aligned), fused without score calibration. Querying with doc 7's
    own words and embedding must fuse doc 7 to rank 1."""
    from pyspark.sql import Row

    from graphlite_spark.operators.similarity import cosine_topk, rrf_fuse
    from graphlite_spark.operators.text import bm25_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    target = docs.where("doc_id = 7").collect()[0]
    terms = [w for w in target["text"].split()[:6] if len(w) > 3][:4]
    lex = bm25_search(docs, terms, k=20).select(
        "doc_id", F.col("score").cast("double").alias("score"))
    qvec = emb.where("vec_id = 7").collect()[0]["embedding"]
    q = spark.createDataFrame(
        [Row(query_id=0, embedding=list(qvec))])
    den = cosine_topk(emb, q, k=20).select(
        F.col("item_id").alias("doc_id"),
        F.col("score").cast("double").alias("score"))
    fused = rrf_fuse([lex, den], id_col="doc_id", topk=5).collect()
    # the synthetic corpus shares a tiny vocabulary, so the two top-20
    # lists are disjoint here — the fusion must still interleave them:
    # the dense #1 (the query doc itself, cosine 1.0) and the lexical
    # #1 tie at 1/(k+1) and occupy the top two fused slots
    top2 = {fused[0]["doc_id"], fused[1]["doc_id"]}
    lex_top = lex.orderBy(F.desc("score"), "doc_id").first()["doc_id"]
    assert top2 == {7, lex_top}
    assert fused[0]["fused_score"] == fused[1]["fused_score"]
    den_ids = {r["doc_id"] for r in den.collect()}
    lex_ids = {r["doc_id"] for r in lex.collect()}
    out_ids = {r["doc_id"] for r in fused}
    assert out_ids <= den_ids | lex_ids


def test_ranking_metrics_closed_form(spark):
    import math

    from graphlite_spark.operators.similarity import ranking_metrics

    # q1: relevant {1,2,3}; top-5 prediction ranks them at 1, 3, absent
    preds = spark.createDataFrame(
        [(1, 1, 0.9), (1, 7, 0.8), (1, 2, 0.7), (1, 8, 0.6), (1, 9, 0.5),
         # q2: nothing relevant retrieved
         (2, 7, 0.9), (2, 8, 0.8)],
        "query_id: long, item_id: long, score: double")
    truth = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (2, 5), (3, 6)],
        "query_id: long, item_id: long")
    got = {r["query_id"]: r.asDict() for r in
           ranking_metrics(preds, truth, k=5).collect()}
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 2) for i in range(3))
    assert got[1]["recall_at_k"] == round(2 / 3, 4)
    assert got[1]["mrr"] == 1.0
    assert got[1]["ndcg_at_k"] == round(dcg / idcg, 4)
    assert got[2] == {"query_id": 2, "recall_at_k": 0.0, "mrr": 0.0,
                      "ndcg_at_k": 0.0, "n_relevant": 1}
    # q3 has truth but NO predictions — must appear with zeros
    assert got[3]["recall_at_k"] == 0.0 and got[3]["n_relevant"] == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        ranking_metrics(preds, truth, k=0)


def test_hll_cumulative_distinct_matches_exact_prefixes(spark):
    """Prefix-merged registers equal the sketch OF the prefix (merge
    soundness), and estimates track exact cumulative distincts."""
    import random

    from pyspark.sql import functions as F

    from graphlite_spark.operators.sketches import hll_cumulative_distinct

    rng = random.Random(7)
    rows = []
    for b in range(5):
        # each bucket introduces some new keys and repeats old ones
        for _ in range(300):
            rows.append((b, rng.randrange(0, 100 * (b + 1))))
    df = spark.createDataFrame(rows, "bucket int, k long")
    got = {r.bucket: r.estimate
           for r in hll_cumulative_distinct(df, "k", "bucket",
                                            p=10).collect()}
    # monotone non-decreasing
    vals = [got[b] for b in range(5)]
    assert vals == sorted(vals)
    # each prefix estimate within HLL error of the exact prefix count
    import math
    for b in range(5):
        exact = df.filter(F.col("bucket") <= b) \
            .select("k").distinct().count()
        rel = abs(got[b] - exact) / exact
        assert rel < 4 * 1.04 / math.sqrt(1 << 10), (b, got[b], exact)
