"""Temporal operators: as-of join, range join, rollup cascade."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graphlite_spark.operators.temporal import asof_join, range_join, rollup


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),
            ("A", _ts("2024-01-01 10:10:00"), 99.0),
            ("B", _ts("2024-01-01 10:02:00"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:01:00"), 10),  # after 10:00 quote
            ("A", _ts("2024-01-01 10:05:00"), 20),  # exactly at 10:05 quote
            ("A", _ts("2024-01-01 09:59:00"), 30),  # before any quote
            ("B", _ts("2024-01-01 10:30:00"), 40),  # 28 min after B quote
            ("C", _ts("2024-01-01 10:00:00"), 50),  # no quotes at all
        ],
        "sym string, ts timestamp, qty int",
    )
    return quotes, trades


def test_asof_backward(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym", right_cols={"px": "px"})
    rows = {(r.sym, r.qty): r.px for r in out.collect()}
    assert rows == {
        ("A", 10): 100.0,
        ("A", 20): 101.0,  # equal timestamps match (<=)
        ("A", 30): None,
        ("B", 40): 50.0,
        ("C", 50): None,
    }
    assert out.count() == trades.count()  # left join: every trade kept


def test_asof_tolerance(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="ts", by="sym", right_cols={"px": "px"}, tolerance="10 minutes"
    )
    rows = {(r.sym, r.qty): r.px for r in out.collect()}
    assert rows[("B", 40)] is None  # 28 min > tolerance -> voided
    assert rows[("A", 10)] == 100.0


def test_asof_forward(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="ts", by="sym", right_cols={"px": "px"}, direction="forward"
    )
    rows = {(r.sym, r.qty): r.px for r in out.collect()}
    assert rows[("A", 30)] == 100.0  # earliest at-or-after 09:59
    assert rows[("A", 10)] == 101.0
    assert rows[("B", 40)] is None  # no later B quote


def test_asof_name_collision(quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError, match="collision"):
        asof_join(trades, quotes, on="ts", by="sym", right_cols={"px": "qty"})


def test_range_join_buckets(spark):
    points = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:30:00")),
            (2, 1, _ts("2024-01-01 13:00:00")),
            (3, 2, _ts("2024-01-01 10:30:00")),  # other key
            (4, 1, _ts("2024-01-01 11:00:00")),  # inclusive end
        ],
        "pid int, k int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            (200, 2, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00")),
        ],
        "iid int, k int, start timestamp, end timestamp",
    )
    out = range_join(points, intervals, by="k", bucket="15 minutes")
    pairs = sorted((r.pid, r.iid) for r in out.collect())
    assert pairs == [(1, 100), (3, 200), (4, 100)]
    # interval spanning many buckets must not duplicate a matched point
    assert out.count() == len(set(pairs))


def test_rollup_cascade(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01 10:05:00"), 1.0),
            (_ts("2024-01-01 10:55:00"), 2.0),
            (_ts("2024-01-01 11:05:00"), 4.0),
            (_ts("2024-01-02 00:00:01"), 8.0),
        ],
        "ts timestamp, v double",
    )
    grains = rollup(df, ts="ts", grains=("hour", "day"), aggs={"v": "sum"})
    hourly = {r.bucket: (r.n_rows, r.sum_v) for r in grains["hour"].collect()}
    assert hourly[_ts("2024-01-01 10:00:00")] == (2, 3.0)
    assert hourly[_ts("2024-01-01 11:00:00")] == (1, 4.0)
    daily = {r.bucket: (r.n_rows, r.sum_v) for r in grains["day"].collect()}
    assert daily[_ts("2024-01-01 00:00:00")] == (3, 7.0)
    assert daily[_ts("2024-01-02 00:00:00")] == (1, 8.0)


def test_rollup_min_max(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01 10:05:00"), 5.0),
            (_ts("2024-01-01 23:05:00"), 1.0),
        ],
        "ts timestamp, v double",
    )
    grains = rollup(df, ts="ts", grains=("hour", "day"), aggs={"v": "min"})
    daily = grains["day"].collect()
    assert len(daily) == 1 and daily[0].min_v == 1.0


def test_asof_plan_single_shuffle(quotes_trades):
    """The as-of join must be one window over a union — a single
    exchange on the key, no join node at all."""
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym", right_cols={"px": "px"})
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_gapfill_locf_zero_interp(spark):
    from graphlite_spark.operators.temporal import gapfill

    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:30:00"), 10.0),
            ("a", _ts("2024-01-01 03:10:00"), 40.0),
            ("b", _ts("2024-01-01 01:15:00"), 5.0),
        ],
        "k string, ts timestamp, value double",
    )
    locf = {(r.k, r.bucket): r.value
            for r in gapfill(df, every="1 hour", by="k", fill="locf").collect()}
    # key a spans 00..03 -> 4 dense buckets; key b one bucket
    assert len(locf) == 5
    assert locf[("a", _ts("2024-01-01 01:00:00"))] == 10.0  # carried forward
    assert locf[("a", _ts("2024-01-01 03:00:00"))] == 40.0
    zero = {(r.k, r.bucket): r.value
            for r in gapfill(df, every="1 hour", by="k", fill="zero").collect()}
    assert zero[("a", _ts("2024-01-01 02:00:00"))] == 0.0
    interp = {(r.k, r.bucket): r.value
              for r in gapfill(df, every="1 hour", by="k", fill="interp").collect()}
    # 10 at 00h, 40 at 03h -> 20 at 01h, 30 at 02h
    assert interp[("a", _ts("2024-01-01 01:00:00"))] == 20.0
    assert interp[("a", _ts("2024-01-01 02:00:00"))] == 30.0
    null = {(r.k, r.bucket): r.value
            for r in gapfill(df, every="1 hour", by="k", fill="null").collect()}
    assert null[("a", _ts("2024-01-01 02:00:00"))] is None


def test_funnel_strict_order_and_window(spark):
    from pyspark.sql import functions as F

    from graphlite_spark.operators.temporal import funnel

    rows = [
        # u1 converts fully: A@0, B@10, C@20
        (1, "A", 0), (1, "B", 10), (1, "C", 20),
        # u2: B before A -> only step 1 credited (B@5 not after A@8)
        (2, "B", 5), (2, "A", 8), (2, "C", 9),
        # wait - u2's C@9 is after A@8 but step 2 is B, no B after A
        # u3: A@0, B@200 outside the 100s window -> step 1 only
        (3, "A", 0), (3, "B", 200),
        # u4: anchored at earliest A@0; B@50 ok; C@140 within 100 of B
        (4, "A", 0), (4, "B", 50), (4, "A", 60), (4, "C", 140),
        # u5: no A at all
        (5, "B", 0), (5, "C", 1),
    ]
    ev = spark.createDataFrame(
        [(u, t, s) for u, t, s in rows],
        "user_id: long, event_type: string, sec: long",
    ).select("user_id", "event_type",
             F.timestamp_seconds(F.col("sec")).alias("ts"))
    got = {r["step"]: (r["event_type"], r["n_users"])
           for r in funnel(ev, ["A", "B", "C"], 100).collect()}
    assert got == {1: ("A", 4), 2: ("B", 2), 3: ("C", 2)}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least 2"):
        funnel(ev, ["A"], 100)
    with _pytest.raises(ValueError, match="within_seconds"):
        funnel(ev, ["A", "B"], 0)


def test_retention_cohorts_closed_form(spark):
    from pyspark.sql import functions as F

    from graphlite_spark.operators.temporal import retention_cohorts

    # two cohorts: users 1,2 first active week 0; user 3 week 1.
    # week 0 = 2024-01-01 (a Monday)
    day = 86400
    rows = [
        (1, 0), (2, 0),              # cohort w0
        (1, 7 * day), (3, 7 * day),  # w1: u1 retained, u3 new cohort
        (2, 14 * day), (3, 14 * day),  # w2
    ]
    ev = spark.createDataFrame(rows, "user_id: long, sec: long").select(
        "user_id",
        F.timestamp_seconds(F.col("sec") + 1704067200).alias("ts"))
    got = {(str(r["cohort"]), r["offset"]):
           (r["n_active"], r["n_cohort"], r["retention"])
           for r in retention_cohorts(ev, horizon=4).collect()}
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-01", 2)] == (1, 2, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert got[("2024-01-08", 1)] == (1, 1, 1.0)


def test_event_transitions_closed_form(spark):
    """Hand-built journeys: counts, row-normalized probabilities,
    deterministic tie-break, last-event exclusion."""
    from graphlite_spark.operators.temporal import event_transitions

    rows = [
        # user 1: view -> click -> view -> buy
        (1, 1, "2024-01-01 10:00:00", "view"),
        (1, 2, "2024-01-01 10:01:00", "click"),
        (1, 3, "2024-01-01 10:02:00", "view"),
        (1, 4, "2024-01-01 10:03:00", "buy"),
        # user 2: view -> view (tie ts -> event_id order), then click
        (2, 5, "2024-01-01 11:00:00", "view"),
        (2, 6, "2024-01-01 11:00:00", "view"),
        (2, 7, "2024-01-01 11:05:00", "click"),
        # user 3: a single event contributes no transition
        (3, 8, "2024-01-01 12:00:00", "buy"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(r.from_type, r.to_type): (r.n, r.prob)
           for r in event_transitions(df).collect()}
    assert got == {
        ("view", "click"): (2, 0.5),
        ("view", "view"): (1, 0.25),
        ("view", "buy"): (1, 0.25),
        ("click", "view"): (1, 1.0),
    }


def test_attribution_first_last_window(spark):
    from graphlite_spark.operators.temporal import attribution

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view"),
        (1, 2, "2024-01-01 10:05:00", "click"),
        (1, 3, "2024-01-01 10:06:00", "purchase"),
        (1, 4, "2024-01-01 12:00:00", "purchase"),  # touch 2h earlier
        # user 2: conversion with NO prior touch, then same-ts touches
        (2, 5, "2024-01-01 09:00:00", "purchase"),
        (2, 6, "2024-01-01 09:30:00", "view"),
        (2, 7, "2024-01-01 09:30:00", "click"),     # same epoch as 6
        (2, 8, "2024-01-01 09:40:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))

    last = {r.event_id: (r.touch_event_id, r.touch_type,
                         r.seconds_to_convert)
            for r in attribution(df, "purchase").collect()}
    assert last[3] == (2, "click", 60)
    assert last[4] == (2, "click", 6900)
    assert last[5] == (None, None, None)            # organic kept
    assert last[8] == (7, "click", 600)             # same-epoch tie -> max id

    first = {r.event_id: r.touch_event_id
             for r in attribution(df, "purchase", mode="first").collect()}
    assert first[3] == 1 and first[4] == 1 and first[8] == 6

    # within window: the 12:00 purchase has no touch within 10 min
    within = {r.event_id: r.touch_event_id
              for r in attribution(df, "purchase",
                                   within_seconds=600).collect()}
    assert within[3] == 2 and within[4] is None

    # touch_types restriction: views only
    views = {r.event_id: r.touch_type
             for r in attribution(df, "purchase",
                                  touch_types=["view"]).collect()}
    assert views[3] == "view" and views[8] == "view"

    with pytest.raises(ValueError):
        attribution(df, "purchase", mode="median")
    with pytest.raises(ValueError):
        attribution(df, "purchase", within_seconds=0)
