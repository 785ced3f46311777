"""Skew-handling join utilities.

AQE's skew-join splitting (on by default in session.py) covers most
cases at runtime; these helpers are for the pathological ones it can't
fix — a build side too large to broadcast joined on a power-law key
(celebrity nodes in a graph, stop-shingles in a dedup index):

- salted_join: replicate the build side SALT ways, scatter the probe
  side with a random-but-deterministic salt, join on (key, salt). Turns
  one hot reducer into SALT evenly-loaded ones at the cost of
  replicating the build side.
- top_keys: find the hot keys first so salting can be applied to only
  the skewed slice (hybrid join), keeping the common case cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys(df: DataFrame, key: str, min_count: int = 100_000) -> DataFrame:
    """Keys whose frequency exceeds min_count — the salting candidates."""
    return (
        df.groupBy(key).agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") >= min_count)
        .select(key)
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the build side replicated `salt` ways.

    Probe rows get a deterministic pseudo-random salt from xxhash64 over
    the whole row (reproducible, no RNG state); build rows are exploded
    across all salt values. Result equals probe.join(build, key, how)
    with the hot-key shuffle partition split `salt` ways.
    """
    pcols = [c for c in probe.columns]
    p = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in pcols]), F.lit(salt))
    )
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = p.join(b, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def hybrid_skew_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    hot_keys: DataFrame,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Split probe/build on hot keys: hot slice joins salted, the rest
    joins normally; union the results. hot_keys: single-column frame
    (from top_keys)."""
    hk = F.broadcast(hot_keys.select(F.col(hot_keys.columns[0]).alias(key)))
    probe_hot = probe.join(hk, key, "left_semi")
    probe_cold = probe.join(hk, key, "left_anti")
    build_hot = build.join(hk, key, "left_semi")
    build_cold = build.join(hk, key, "left_anti")
    hot = salted_join(probe_hot, build_hot, key, salt, how)
    cold = probe_cold.join(build_cold, on=key, how=how)
    return hot.unionByName(cold.select(*hot.columns))
