"""Window / analytic operators (beyond-reference surface).

The reference has **no** window functions (SURVEY.md §2.5: nothing in
`graphlite/src/functions/mod.rs:39-259` or the AST; its closest shape is
ORDER BY + LIMIT top-k, `graphlite/src/exec/streaming_topk.rs:58-226`,
which is global-only). A training-data pipeline needs the partitioned
variants constantly — "latest N per key", "running totals", "deltas vs
previous event" — so they are first-class here, built directly on
`pyspark.sql.Window` so Catalyst plans them as a single WindowExec over
one shuffle per partitioning key.

Scale notes (100 TB):
- Every function here shuffles **once** on the partition keys and sorts
  within partitions — the minimum possible for windowed semantics. No
  self-joins, no per-row subqueries (the reference answers "top order
  per customer" with a correlated ORDER BY..LIMIT 1 subquery — a
  nested-loop re-scan per outer row, executor.rs:3864-3877).
- ``top_n_per_group`` uses `row_number` + filter; AQE can coalesce the
  post-filter partitions. For tiny n and huge groups this is the
  standard plan (Spark rewrites no further, but the window's sort is
  spillable Tungsten sort, so skewed hot keys degrade gracefully).
- Running frames (`running_total`, `moving_average`) use explicit
  `rowsBetween` frames, which stream within a partition — O(1) state
  for sums, O(k) for a k-row moving window — instead of materializing
  per-row arrays.
- Tie-breaking: every ordering takes an explicit full ordering (caller
  supplies unique tiebreak columns) so results are deterministic and
  oracle-checkable — a window over a non-total order is a
  nondeterminism bug at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "top_n_per_group",
    "running_total",
    "lag_delta",
    "moving_average",
    "rank_in_group",
    "ntile_buckets",
]


def _spec(partition_by: list[str], order_by: list) -> WindowSpec:
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_by]
    return Window.partitionBy(*partition_by).orderBy(*cols)


def top_n_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-n rows per group by a total order (`row_number` + filter).

    `order_by` must be a total order within each partition (pass a
    unique key last) or results are nondeterministic.
    """
    w = _spec(partition_by, order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def rank_in_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    method: str = "rank",
    rank_col: str = "rnk",
) -> DataFrame:
    """rank / dense_rank / percent_rank within each partition."""
    fns = {
        "rank": F.rank,
        "dense_rank": F.dense_rank,
        "percent_rank": F.percent_rank,
        "row_number": F.row_number,
    }
    if method not in fns:
        raise ValueError(f"unknown rank method {method!r}; use {sorted(fns)}")
    return df.withColumn(rank_col, fns[method]().over(_spec(partition_by, order_by)))


def running_total(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    value: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative sum of `value` in `order_by` order within each group.

    Explicit unbounded-preceding..current frame: WindowExec keeps a
    single accumulator per partition (no buffering of prior rows).
    """
    w = _spec(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(value).over(w))


def lag_delta(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    value: str,
    offset: int = 1,
    out_col: str = "delta",
    prev_col: str = "prev_value",
) -> DataFrame:
    """Previous value and difference vs `offset` rows back (NULL first row)."""
    w = _spec(partition_by, order_by)
    prev = F.lag(value, offset).over(w)
    return df.withColumn(prev_col, prev).withColumn(
        out_col, F.col(value) - prev
    )


def moving_average(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    value: str,
    window_rows: int,
    out_col: str = "moving_avg",
) -> DataFrame:
    """Trailing average over the last `window_rows` rows (inclusive)."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    w = _spec(partition_by, order_by).rowsBetween(
        -(window_rows - 1), Window.currentRow
    )
    return df.withColumn(out_col, F.avg(value).over(w))


def ntile_buckets(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    buckets: int,
    out_col: str = "bucket",
) -> DataFrame:
    """Equi-depth bucketing (quantile assignment) within each group."""
    return df.withColumn(
        out_col, F.ntile(buckets).over(_spec(partition_by, order_by))
    )


def table_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    p: int = 12,
    salt: int = 0,
) -> DataFrame:
    """(column, n_rows, n_null, null_rate, approx_distinct, min_value,
    max_value, mean, stddev): Deequ-style column profiling — the data-
    quality pass a pipeline runs on every new corpus drop before
    trusting it (null-rate spikes, cardinality collapse, and range
    drift are the three classic ingestion failures).

    Exact stats (counts, nulls, min/max as strings, mean/stddev for
    numerics) come from ONE shared aggregate job over the scan — a
    single 1-row reduce, no shuffle of data rows. approx_distinct is
    this repo's replayable HLL (sketches.hll_count_distinct: fmix32
    registers, NOT Spark's approx_count_distinct, whose HLL++ is not
    oracle-mirrorable) — one sketch-sized aggregation per column,
    each shuffling at most 2^p register rows. Non-numeric columns
    fold through xxhash64 for the sketch (engine-specific — profile
    entries oracle-match on numeric columns; string distincts are
    pytest-pinned against exact counts).

    At 100 TB: k columns cost TWO passes over the table regardless of
    k — the shared exact-stats reduce (one job, no data shuffle) and
    ONE sketch pass for ALL columns (r8 ADVICE; was k separate
    passes): each row explodes into k (column, key) structs map-side,
    and one grouped register aggregation (map-side combined to
    <= k * 2^p rows) feeds the estimator — per-column register math
    identical to k separate hll_count_distinct calls, just grouped.
    """
    from pyspark.sql.types import IntegralType, NumericType

    from .sketches import hll_estimate, hll_sketch

    if cols is None:
        cols = df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
        if isinstance(schema[c], NumericType):
            aggs.append(F.avg(F.col(c)).alias(f"_mean_{c}"))
            aggs.append(F.stddev(F.col(c)).alias(f"_sd_{c}"))
    row = df.agg(*aggs).collect()[0]  # O(columns) scalars, one job
    spark = df.sparkSession

    # one-pass sketch build: explode each row into (column, key)
    # structs. Only integral keys feed the replayable mix32 directly —
    # fractional values would be CAST to long (truncate in Spark,
    # round in other engines: a silent cross-engine mismatch AND a
    # distinctness collapse), so they fold through xxhash64 like
    # strings. xxhash64(NULL) is the seed hash, NOT NULL — mask nulls
    # first or every column with any null over-counts by one.
    entries = []
    for c in cols:
        key = (F.col(c).cast("long")
               if isinstance(schema[c], IntegralType)
               else F.when(F.col(c).isNotNull(), F.xxhash64(c)))
        entries.append(F.struct(F.lit(c).alias("column"),
                                key.alias("_k")))
    pairs = (
        df.select(F.explode(F.array(*entries)).alias("_e"))
        .select(F.col("_e.column").alias("column"),
                F.col("_e._k").alias("_k"))
        .filter(F.col("_k").isNotNull())
    )
    ad = hll_estimate(
        hll_sketch(pairs, "_k", group_cols=("column",), p=p, salt=salt),
        p, group_cols=("column",),
    ).select("column", F.col("estimate").alias("approx_distinct"))

    out = None
    for c in cols:
        numeric = isinstance(schema[c], NumericType)
        n = int(row["_n"])
        nulls = int(row[f"_null_{c}"] or 0)
        stats = spark.createDataFrame(
            [(
                c, n, nulls,
                round(nulls / n, 6) if n else 0.0,
                row[f"_min_{c}"], row[f"_max_{c}"],
                round(float(row[f"_mean_{c}"]), 6)
                if numeric and row[f"_mean_{c}"] is not None else None,
                round(float(row[f"_sd_{c}"]), 6)
                if numeric and row[f"_sd_{c}"] is not None else None,
            )],
            "column string, n_rows long, n_null long, null_rate double, "
            "min_value string, max_value string, mean double, "
            "stddev double",
        )
        out = stats if out is None else out.unionByName(stats)
    out = out.join(F.broadcast(ad), "column", "left")
    return out.select(
        "column", "n_rows", "n_null", "null_rate",
        F.coalesce("approx_distinct", F.lit(0.0)).alias("approx_distinct"),
        "min_value", "max_value", "mean", "stddev",
    )


def anomaly_zscore(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    order_by: list,
    window: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """+ (baseline_mean, baseline_std, zscore, is_anomaly): rolling
    z-score outlier detection per key — each point is compared against
    the TRAILING ``window`` rows EXCLUDING itself (a baseline that
    contains the point dampens exactly the spikes it should flag).
    Points with fewer than 2 baseline rows or zero baseline variance
    get NULL zscore and never flag (insufficient evidence is not an
    anomaly). One shuffle on the partition keys; the frame is a
    streaming Tungsten window, O(window) state per key.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    spec = _spec(partition_by, order_by).rowsBetween(-window, -1)
    x = F.col(value_col)
    # stage the three window aggregates as named columns ONCE — inlining
    # them into every derived expression re-expands each windowspec
    # (the plan showed 12 window expressions where 3 suffice)
    staged = (
        df.withColumn("_bm", F.avg(x).over(spec))
        .withColumn("_bs", F.stddev(x).over(spec))
        .withColumn("_bc", F.count(x).over(spec))
    )
    z = F.when((F.col("_bc") >= 2) & (F.col("_bs") > 0),
               (x - F.col("_bm")) / F.col("_bs"))
    return (
        staged.withColumn("baseline_mean", F.round("_bm", 6))
        .withColumn("baseline_std", F.round("_bs", 6))
        .withColumn("zscore", F.round(z, 6))
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False)))
        .drop("_bm", "_bs", "_bc")
    )
