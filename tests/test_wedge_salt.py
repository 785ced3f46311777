"""Pin the wedge-closure join's scale posture (VERDICT r11 asks #5/#8).

Below the measured-edge-count broadcast cap the closing-edge side is
broadcast (r11 regime, plans committed). ABOVE the cap, r12 replaces
the plain (b, c) shuffle join with a SALTED one: a hot (b, c) pair is
a single join key, which AQE's skew split cannot divide, so on a
boilerplate-heavy 100 TB graph its wedge rows would land on one task.
These tests force the above-cap regime on a small planted-hot-key
graph and pin (a) identical results, (b) the salt actually splitting
the hot key's wedge rows across many salt values (the bounded
per-task-input property), and (c) the byte-based broadcast guard
falling back for wide rows at counts the old row-only threshold would
have broadcast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _hot_key_graph(spark, n_common: int = 200):
    """One hot closing edge (b=900001, c=900002) sharing n_common
    wedge-opening neighbors — every triangle's closure lands on the
    single (b, c) key."""
    rows = [(900001, 900002)]
    for i in range(n_common):
        rows.append((i, 900001))
        rows.append((i, 900002))
    return spark.createDataFrame(rows, "src: long, dst: long")


def test_salted_closure_matches_broadcast_closure(spark, monkeypatch):
    import graphlite_spark.operators.paths as P

    edges = _hot_key_graph(spark)
    expected = P.triangle_count(edges, "src", "dst").collect()[0]["n_triangles"]
    assert expected == 200  # every common neighbor closes one triangle

    # force the above-cap regime: the broadcast guard refuses, the
    # closure runs salted
    monkeypatch.setattr(P, "_WEDGE_BROADCAST_MAX_EDGES", 0)
    salted = P.triangle_count(edges, "src", "dst").collect()[0]["n_triangles"]
    assert salted == expected
    # per-vertex counts survive the salted path too (explode consumer)
    per_v = dict(
        P.triangles_per_vertex(edges, "src", "dst").collect()
    )
    assert per_v[900001] == 200 and per_v[900002] == 200


def test_salted_plan_splits_the_hot_key(spark, monkeypatch):
    import graphlite_spark.operators.paths as P

    edges = _hot_key_graph(spark)
    monkeypatch.setattr(P, "_WEDGE_BROADCAST_MAX_EDGES", 0)
    tris = P._oriented_triangle_triples(edges, "src", "dst")
    # the salted join key must appear in the physical plan
    plan = tris._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, "above-cap closure did not take the salted join"
    # bounded per-task input: the hot key's wedge rows spread over
    # many distinct salt values (each (b, c, salt) slice is its own
    # join partition key)
    salts = (
        tris.select(
            F.pmod(F.xxhash64("a", "b", "c"),
                   F.lit(P._WEDGE_SALT)).alias("s"))
        .distinct().count()
    )
    assert salts >= 10, (
        f"hot-key wedges landed on only {salts} of 16 salts — "
        "the salted split is not bounding per-task input"
    )


def test_byte_guard_blocks_wide_rows_at_allowed_counts():
    from pyspark.sql import types as T

    from graphlite_spark.operators.common import (est_row_bytes,
                                                  fits_broadcast)

    narrow = T.StructType([
        T.StructField("b", T.LongType()),
        T.StructField("c", T.LongType()),
    ])
    wide = T.StructType([
        T.StructField("b", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("toks", T.ArrayType(T.StringType())),
    ])
    assert est_row_bytes(wide) > est_row_bytes(narrow)
    # 4M narrow id rows: inside both the row cap and the byte cap —
    # the r11 decision is unchanged
    assert fits_broadcast(4_000_000, narrow, max_rows=4_000_000)
    # same row count, wide rows: the row-only threshold would have
    # broadcast this; the byte guard must refuse
    assert not fits_broadcast(4_000_000, wide, max_rows=4_000_000)
    # row cap still binds first
    assert not fits_broadcast(4_000_001, narrow, max_rows=4_000_000)
