"""Temporal joins and rollups for event/time-series tables.

Reference parity: GraphLite models events as nodes and answers
"latest-state-at-time-T" questions with ORDER BY ts DESC LIMIT 1
per-entity subqueries (reference: graphlite/src/exec/executor.rs
nested-loop join + sort). At 100 TB that shape is a correlated scan
per row; the implementations here restate the same semantics as
single-shuffle distributed plans:

- ``asof_join``: most-recent-match join. Instead of a per-row lookup
  or an O(n*m) range join, both sides are union-tagged and resolved
  with one ``last(..., ignorenulls=True)`` running window per key —
  ONE shuffle on the key column, linear per-partition scan, no row
  explosion, AQE-friendly. This is the standard distributed as-of
  design (same plan Flink/kdb+ use for time joins).
- ``range_join``: interval containment join. Equi-bucketing time into
  fixed-width buckets turns an inequality join into an equi-join on
  (key, bucket) that Catalyst executes hash-partitioned; each interval
  explodes into the buckets it covers, each point lands in exactly one
  bucket, so no post-join dedup is needed. Bucket width trades shuffle
  fan-out vs filter selectivity; at 100 TB pick bucket ~ median
  interval length so the explode factor stays O(1).
- ``rollup``: hypertable-style multi-grain pre-aggregation. The finest
  grain is computed from raw data once; every coarser grain re-uses
  the next-finer aggregate (counts/sums/min/max are re-aggregable), so
  a day/hour/minute cascade over 100 TB reads the raw table exactly
  once. Map-side partial aggregation handles the heavy lifting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "gapfill", "range_join", "rollup"]

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _interval_seconds(text: str) -> int:
    """'15 minutes' -> 900. Fixed-width units only (no months/years,
    whose length is calendar-dependent and unfit for equi-bucketing)."""
    parts = text.strip().split()
    if len(parts) != 2:
        raise ValueError(f"expected '<n> <unit>', got {text!r}")
    n, unit = int(parts[0]), parts[1].lower().rstrip("s")
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported bucket unit {unit!r}; use {sorted(_UNIT_SECONDS)}")
    return n * _UNIT_SECONDS[unit]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: dict[str, str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row at-or-before
    (``backward``) / earliest at-or-after (``forward``) its ``on`` time,
    optionally per ``by`` key, as a left join (unmatched -> NULLs).

    ``right_cols`` maps right column -> output name (default: every
    non-key right column under its own name, which must not collide).
    ``tolerance`` (e.g. ``'1 hour'``) voids matches farther than that
    from the left timestamp.

    Plan shape: union both sides, one window shuffle on ``by``; no
    range join, no per-key collect. Equal timestamps: the right row is
    visible to a left row at the same instant (ties among right rows
    broken by largest ``on``-order position, deterministic given unique
    (by, on) pairs on the right).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        keep = [c for c in right.columns if c != on and c not in by_cols]
        right_cols = {c: c for c in keep}
    clash = set(right_cols.values()) & set(left.columns)
    if clash:
        raise ValueError(f"output name collision with left columns: {sorted(clash)}")

    rts = "__asof_rts"
    side = "__asof_side"
    # right rows carry payload + their own timestamp; left rows carry NULLs
    r = right.select(
        *[F.col(c).alias(c) for c in by_cols],
        F.col(on).alias(on),
        F.col(on).alias(rts),
        F.lit(0).alias(side),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )
    l = left.select(
        "*",
        F.lit(None).cast(r.schema[rts].dataType).alias(rts),
        F.lit(1).alias(side),
        *[
            F.lit(None).cast(right.schema[src].dataType).alias(dst)
            for src, dst in right_cols.items()
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right (side=0) sorts before left (side=1) at equal ts -> `<=`
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(on).asc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(on).desc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = unioned.select(
        "*",
        F.last(F.col(rts), ignorenulls=True).over(w).alias("__m_ts"),
        *[
            F.last(F.col(dst), ignorenulls=True).over(w).alias(f"__m_{dst}")
            for dst in right_cols.values()
        ],
    )
    out = filled.filter(F.col(side) == 1)
    if tolerance is not None:
        # pure timestamp arithmetic — no interval-to-seconds extraction,
        # stays inside codegen and is timezone-independent
        tol = F.expr(f"interval '{tolerance}'")
        if direction == "backward":
            in_tol = F.col(on) <= F.col("__m_ts") + tol
        else:
            in_tol = F.col("__m_ts") <= F.col(on) + tol
        within = F.col("__m_ts").isNotNull() & in_tol
    else:
        within = F.col("__m_ts").isNotNull()
    proj = [F.col(c) for c in left.columns]
    proj.append(F.when(within, F.col("__m_ts")).otherwise(F.lit(None)).alias(f"matched_{on}"))
    proj += [
        F.when(within, F.col(f"__m_{dst}")).otherwise(F.lit(None)).alias(dst)
        for dst in right_cols.values()
    ]
    return out.select(*proj)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    by: str | list[str] | None = None,
    bucket: str = "1 hour",
) -> DataFrame:
    """Join every point row to every interval row containing it
    (``start <= point_ts <= end``), optionally also matching ``by`` keys.

    Implemented as an equi-join on (by, time bucket): intervals explode
    into the fixed-width buckets they cover, points map to exactly one
    bucket, the containment predicate filters after the hash join. No
    O(n*m) cross product; explode factor = interval_len / bucket.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    sec = F.lit(float(_interval_seconds(bucket)))
    b = "__rj_bucket"

    from pyspark.sql.types import TimestampNTZType

    def _epoch(df: DataFrame, name: str) -> Column:
        # TIMESTAMP_NTZ rejects the direct double cast; go via TIMESTAMP
        c = F.col(name)
        if isinstance(df.schema[name].dataType, TimestampNTZType):
            c = c.cast("timestamp")
        return c.cast("double")

    pts = points.withColumn(
        b, F.floor(_epoch(points, point_ts) / sec).cast("long")
    )
    ivs = intervals.withColumn(
        b,
        F.explode(
            F.sequence(
                F.floor(_epoch(intervals, start) / sec).cast("long"),
                F.floor(_epoch(intervals, end) / sec).cast("long"),
            )
        ),
    )
    cond = [pts[b] == ivs[b]] + [pts[c] == ivs[c] for c in by_cols]
    joined = pts.join(ivs, cond, "inner").filter(
        (pts[point_ts] >= ivs[start]) & (pts[point_ts] <= ivs[end])
    )
    proj = [pts[c] for c in points.columns]
    proj += [ivs[c] for c in intervals.columns if c not in by_cols]
    return joined.select(*proj)


def rollup(
    df: DataFrame,
    ts: str = "ts",
    grains: tuple[str, ...] = ("hour", "day"),
    aggs: dict[str, str] | None = None,
    by: str | list[str] | None = None,
) -> dict[str, DataFrame]:
    """Hypertable-style rollup cascade: aggregate at the finest grain
    from raw rows, then derive each coarser grain from the previous
    aggregate (single raw scan; counts become sums downstream).

    ``grains`` must be ordered finest -> coarsest (date_trunc units).
    ``aggs`` maps column -> 'sum'|'count'|'min'|'max'.
    Returns {grain: DataFrame} with columns (bucket, *by, <aggs>, n_rows).
    """
    aggs = aggs or {}
    by_cols = [by] if isinstance(by, str) else list(by or [])
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for i, grain in enumerate(grains):
        if prev is None:
            base = df.withColumn("bucket", F.date_trunc(grain, F.col(ts)))
            exprs = [F.count(F.lit(1)).alias("n_rows")]
            for col, how in aggs.items():
                fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[how]
                exprs.append(fn(F.col(col)).alias(f"{how}_{col}"))
        else:
            base = prev.withColumn("bucket", F.date_trunc(grain, F.col("bucket")))
            exprs = [F.sum("n_rows").alias("n_rows")]
            for col, how in aggs.items():
                name = f"{how}_{col}"
                fn = F.sum if how in ("sum", "count") else {"min": F.min, "max": F.max}[how]
                exprs.append(fn(F.col(name)).alias(name))
        cur = base.groupBy("bucket", *by_cols).agg(*exprs)
        out[grain] = cur
        prev = cur
    return out


def gapfill(
    df: DataFrame,
    ts: str = "ts",
    every: str = "1 hour",
    by: str | list[str] | None = None,
    value_col: str = "value",
    agg: str = "sum",
    fill: str = "locf",
) -> DataFrame:
    """Hypertable-style gap-filled time series: bucket + aggregate, then
    densify each key's bucket range and fill empty buckets.

    fill strategies:
    - 'null'   keep missing buckets NULL
    - 'zero'   0.0
    - 'locf'   last observation carried forward (classic gapfill)
    - 'interp' linear interpolation between surrounding observations
               (edges fall back to the nearest observation)

    Scale shape: one groupBy on (key, bucket) over raw rows (map-side
    partial agg), one tiny per-key (min,max) aggregate whose
    sequence+explode generates the dense domain map-side — the dense
    frame is #keys * #buckets rows, never a function of raw row count —
    one co-keyed left join (AQE-coalesced), and the fills are single
    ordered windows per key. No driver-side loops, nothing collected.
    Returns (bucket timestamp, *by, value).
    """
    from pyspark.sql.types import TimestampNTZType

    step = _interval_seconds(every)
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if fill not in ("null", "zero", "locf", "interp"):
        raise ValueError(f"unknown fill strategy {fill!r}")
    c = F.col(ts)
    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        c = c.cast("timestamp")
    bucket = (F.floor(c.cast("long") / step) * step).alias("_b")
    agg_fn = {"sum": F.sum, "count": F.count, "min": F.min,
              "max": F.max, "avg": F.avg}[agg]
    per = (
        df.select(*by_cols, bucket, F.col(value_col).cast("double").alias("_v"))
        .groupBy(*by_cols, "_b")
        .agg(agg_fn("_v").alias("_v"))
    )
    dom = (
        per.groupBy(*by_cols)
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select(
            *by_cols,
            F.explode(F.sequence("_lo", "_hi", F.lit(step).cast("long"))).alias("_b"),
        )
    )
    out = dom.join(per, [*by_cols, "_b"], "left")
    w = Window.partitionBy(*by_cols).orderBy("_b")
    if fill == "zero":
        v = F.coalesce(F.col("_v"), F.lit(0.0))
    elif fill == "locf":
        v = F.coalesce(
            F.col("_v"),
            F.last("_v", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    elif fill == "interp":
        prev_v = F.last("_v", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        next_v = F.first("_v", ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)
        )
        prev_b = F.last(F.when(F.col("_v").isNotNull(), F.col("_b")), ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        next_b = F.first(F.when(F.col("_v").isNotNull(), F.col("_b")), ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)
        )
        frac = (F.col("_b") - prev_b).cast("double") / (next_b - prev_b).cast("double")
        interp = prev_v + (next_v - prev_v) * frac
        v = F.coalesce(F.col("_v"), interp, prev_v, next_v)
    else:
        v = F.col("_v")
    return out.select(
        F.timestamp_seconds(F.col("_b")).alias("bucket"),
        *by_cols,
        v.alias("value"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, event_type, n_users) — strict-order funnel conversion.

    The product-analytics staple: per user, anchor at the EARLIEST
    occurrence of step 1, then require each subsequent step strictly
    after the previous one and within ``within_seconds`` of it,
    always taking the earliest qualifying event (the standard
    earliest-anchored semantics; a later anchor that would convert
    when the earliest doesn't is deliberately not credited — document
    before comparing numbers across tools).

    Scale shape: k-1 joins, each keyed on the user id between a
    filtered event scan and the previous step's one-row-per-user
    frame — the per-step frames only shrink, and every aggregate is a
    map-side-combined min. No windows over whole user histories.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if within_seconds <= 0:
        raise ValueError(f"within_seconds must be > 0,"
                         f" got {within_seconds}")
    t = F.col(ts_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col).agg(F.min(ts_col).alias("_t"))
    )
    out_rows = [cur.agg(
        F.lit(1).alias("step"), F.lit(steps[0]).alias("event_type"),
        F.count(F.lit(1)).alias("n_users"))]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == step)
            .join(cur, user_col)
            .where((t > F.col("_t")) &
                   (t <= F.col("_t") +
                    F.expr(f"INTERVAL {int(within_seconds)} SECOND")))
            .groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        )
        out_rows.append(nxt.agg(
            F.lit(i).alias("step"), F.lit(step).alias("event_type"),
            F.count(F.lit(1)).alias("n_users")))
        cur = nxt
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out


def retention_cohorts(
    events: DataFrame,
    horizon: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, offset, n_active, n_cohort, retention) — weekly
    retention triangle: cohort = the Monday week of a user's FIRST
    event; offset = weeks since cohort; n_active = cohort members
    active that week. offset 0 is the cohort size by construction.

    Scale shape: one min-per-user aggregate (the cohort assignment,
    broadcastable — one row per user), one distinct over (user, week),
    a join back on user id, and a counting groupBy — no windows, no
    per-user sorting.
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    first = (
        events.groupBy(user_col)
        .agg(F.min(ts_col).alias("_first")))
    cohort = first.select(
        user_col,
        F.date_trunc("week", F.col("_first")).cast("date").alias("cohort"))
    active = events.select(user_col, week.alias("_week")).distinct()
    joined = active.join(cohort, user_col).withColumn(
        "offset", (F.datediff(F.col("_week"), F.col("cohort")) / 7)
        .cast("long"))
    counts = (
        joined.where(F.col("offset").between(0, horizon))
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = cohort.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort"))
    return (
        counts.join(sizes, "cohort")
        .select("cohort", "offset", "n_active", "n_cohort",
                F.round(F.col("n_active") / F.col("n_cohort"), 4)
                .alias("retention"))
    )


def funnel_user_steps(
    events: DataFrame,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_id, step, event_type, t) — one row per step each user
    REACHED, with the anchored timestamp. The user-granular view of
    ``funnel`` (identical chain of shrinking joins; funnel's counts
    are this frame's per-step sizes) and the batch twin of
    ``streaming.stateful.streaming_funnel``.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if within_seconds <= 0:
        raise ValueError(f"within_seconds must be > 0,"
                         f" got {within_seconds}")
    t = F.col(ts_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col).agg(F.min(ts_col).alias("_t"))
    )
    frames = [cur.select(
        F.col(user_col).alias("user_id"), F.lit(1).alias("step"),
        F.lit(steps[0]).alias("event_type"), F.col("_t").alias("t"))]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == step)
            .join(cur, user_col)
            .where((t > F.col("_t")) &
                   (t <= F.col("_t") +
                    F.expr(f"INTERVAL {int(within_seconds)} SECOND")))
            .groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        )
        frames.append(nxt.select(
            F.col(user_col).alias("user_id"), F.lit(i).alias("step"),
            F.lit(step).alias("event_type"), F.col("_t").alias("t")))
        cur = nxt
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(from_type, to_type, n, prob): first-order Markov transition
    matrix over each user's time-ordered event sequence — the
    user-journey fingerprint product analytics builds sankeys and
    next-action models from.

    prob is row-normalized (P(to | from) — each from_type's
    probabilities sum to 1). Ordering ties break on ``tiebreak_col``
    so the matrix is deterministic and ANSI-replayable.

    Scale shape: ONE shuffle on the user id for the lead window (the
    per-user sort is partition-local), then a groupBy whose key space
    is |event types|² — map-side combine collapses each partition to
    the matrix size, and the row normalization is a window over those
    few rows. No per-user state beyond the sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("prob"),
    )


def attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str] | None = None,
    mode: str = "last",
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(conversion event_id, user_id, conv_ts, touch_event_id,
    touch_type, touch_ts, seconds_to_convert): first-/last-touch
    conversion attribution — credit each conversion to the earliest/
    latest STRICTLY-EARLIER touch event of the same user (optionally
    within ``within_seconds``). Unattributed conversions keep NULL
    touch columns (dropping them would hide organic conversions).

    Determinism without IGNORE NULLS ordering hazards: the attributed
    touch is MIN/MAX of struct(epoch, id, type) over a RANGE frame
    ending at 1 PRECEDING — strictly-earlier-epoch semantics are
    tie-safe across engines (a ROWS frame would depend on the
    nondeterministic order of same-timestamp rows), and the struct
    comparison breaks same-epoch touch ties by id. One shuffle on the
    user key; O(1) window state (min/max, not a buffered frame).

    ``touch_types=None`` counts every non-conversion event as a touch.
    """
    if mode not in ("first", "last"):
        raise ValueError(f"mode must be 'first' or 'last', got {mode!r}")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError("within_seconds must be > 0")
    from pyspark.sql import Window
    from pyspark.sql.types import TimestampNTZType

    df = events
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    df = df.withColumn("_ep", F.unix_timestamp(ts_col))
    if touch_types is None:
        is_touch = F.col(type_col) != conversion_type
    else:
        is_touch = F.col(type_col).isin(list(touch_types))
    tv = F.when(is_touch, F.struct(
        F.col("_ep").alias("ep"),
        F.col(id_col).alias("id"),
        F.col(type_col).alias("tp")))
    lo = (Window.unboundedPreceding if within_seconds is None
          else -int(within_seconds))
    w = Window.partitionBy(user_col).orderBy("_ep").rangeBetween(lo, -1)
    agg = F.max(tv).over(w) if mode == "last" else F.min(tv).over(w)
    out = df.withColumn("_touch", agg).filter(
        F.col(type_col) == conversion_type)
    return out.select(
        F.col(id_col), F.col(user_col),
        F.col(ts_col).alias("conv_ts"),
        F.col("_touch.id").alias("touch_event_id"),
        F.col("_touch.tp").alias("touch_type"),
        # the touch's floored-second epoch back as a timestamp (the
        # window math runs on floored epochs, so this is the touch
        # instant at the operator's own resolution)
        F.col("_touch.ep").cast("timestamp").alias("touch_ts"),
        (F.col("_ep") - F.col("_touch.ep")).alias("seconds_to_convert"),
    )
