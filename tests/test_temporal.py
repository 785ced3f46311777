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
