"""Window / ordered analytics: sessionization, running aggregates,
as-of joins.

Scale notes: every operator here is a single shuffle-and-sort on its
partition key (user_id / join key).  Skewed keys (one user with
millions of events) are the main risk at 100 TB — AQE handles the join
cases; for pathological window skew, pre-split hot keys by a
time-bucket salt and merge.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per user (batch sessionization).

    A new session starts when the gap to the previous event exceeds
    ``gap_minutes``.  One window (partition by user, order by ts):
    lag → boundary flag → running sum.  The streaming variant is
    ``streaming.events.sessionize_stream`` (session_window).
    """
    order = [F.col(ts_col), F.col("event_id")] if "event_id" in events.columns else [
        F.col(ts_col)
    ]
    w = Window.partitionBy(user_col).orderBy(*order)
    # integer microseconds — exact arithmetic, reproducible in any
    # engine (double-seconds casts round differently across engines)
    from pyspark.sql.types import TimestampType

    if isinstance(events.schema[ts_col].dataType, TimestampType):
        ts_val = F.unix_micros(F.col(ts_col))
        gap_limit = F.lit(int(gap_minutes * 60_000_000))
    else:
        ts_val = F.col(ts_col)
        gap_limit = F.lit(gap_minutes)
    gap = ts_val - F.lag(ts_val).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_limit), F.lit(1)).otherwise(
        F.lit(0)
    )
    return events.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-user session summary: #sessions, #events, events/session."""
    s = sessionize(
        events, user_col=user_col, ts_col=ts_col, gap_minutes=gap_minutes
    )
    # truncate, don't round: small-denominator ratios sit on exact .5
    # rounding boundaries where engines disagree (see text_analysis)
    ratio = F.count(F.lit(1)).cast("double") / F.max("session_id")
    return s.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        (F.floor(ratio * 10000) / F.lit(10000.0)).alias(
            "events_per_session"
        ),
    )


def running_total(
    df: DataFrame,
    *,
    partition_col: str,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative sum per partition in a deterministic order."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.round(F.sum(value_col).over(w), 2))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tie_break: str | None = None,
) -> DataFrame:
    """As-of (point-in-time) left join: for each left row, the most
    recent right row with ``right_ts <= left_ts`` on the same key.

    Spark-first implementation: tag + union both sides, ONE window
    sort per key carries the latest right payload forward
    (``last(ignorenulls)``), then keep left rows.  Cost is a single
    shuffle+sort of |left|+|right| rows — no per-row range join, no
    explosion, which is what makes it hold up at 100 TB (the naive
    ``JOIN ... ON ts <= ts`` + argmax explodes quadratically per key).

    ``tie_break``: right column ordering rows *within* an equal
    timestamp; the largest value wins (deterministic).
    """
    left_key, right_key = (on, on) if isinstance(on, str) else on
    payload = F.struct(
        *[F.col(c) for c in right_cols]
    )
    tb = F.col(tie_break) if tie_break else F.lit(0)
    r = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right rows sort before left at equal ts
        tb.alias("__tb"),
        payload.alias("__payload"),
    )
    l = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r = r.withColumn(
        "__left",
        F.lit(None).cast(l.schema["__left"].dataType),
    )
    unioned = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__left")[c].alias(c) for c in left.columns],
        *[F.col("__asof")[c].alias(c) for c in right_cols],
    )
    return out


def _to_line(col_name: str, df: DataFrame):
    """Numeric view of a point/bound column plus its unit tag:
    timestamps → epoch micros (exact long, unit ``"micros"``), dates →
    epoch days (``"days"``), integral types pass through (``"raw"``).
    Used only for bucketing and the containment filter — output
    columns keep their original type.  The unit tag lets the caller
    reject mixed-unit column trios (a timestamp point against date
    intervals compares micros to days — silently wrong)."""
    dt = df.schema[col_name].dataType.simpleString()
    c = F.col(col_name)
    if dt == "timestamp_ntz":
        # NTZ has no epoch; the session-zone cast is a consistent
        # monotone mapping, and all three line columns convert the
        # same way — only differences and buckets matter here
        return F.unix_micros(c.cast("timestamp")), "micros"
    if dt.startswith("timestamp"):
        return F.unix_micros(c), "micros"
    if dt == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("long"), "days"
    if dt in ("long", "int", "bigint", "integer", "smallint"):
        return c.cast("long"), "raw"
    raise ValueError(
        f"bucketed_interval_join: unsupported type {dt} for {col_name!r}"
        " (timestamp, date, or integral required — pre-scale floats"
        " yourself, the bucket grid must be exact)"
    )


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    on: str | tuple[str, str] | None = None,
    bucket_width: int,
    end_inclusive: bool = True,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Point-in-interval equi-ized join: every point row paired with
    every interval row containing it (same ``on`` key, ``start ≤ p ≤
    end``; strict end when ``end_inclusive=False``).

    Why this operator exists: open-source Catalyst plans a raw
    ``p BETWEEN s AND e`` join as BroadcastNestedLoopJoin (or a
    per-key cartesian) — quadratic per key, the classic 100 TB
    cliff.  The fix is the standard range-bucketing rewrite: each
    interval EXPLODES to the ⌈span/width⌉ grid buckets it covers, each
    point hashes to its single bucket, and the join becomes a plain
    equi-join on (key, bucket) + a residual containment filter.  Each
    qualifying (point, interval) pair meets in EXACTLY one bucket (the
    point's), so no post-dedup is needed.  Cost is linear:
    |points| + Σ spans/width exploded rows through one hash join —
    pick ``bucket_width`` near the median interval span so most
    intervals explode to 1–2 rows (the ``max_buckets_per_interval``
    guard raises mid-plan on a width that would detonate — a plan bug,
    not data to silently absorb).

    Time semantics: timestamps bucket on exact epoch micros, dates on
    epoch days, integrals as-is; output columns keep their original
    types.  Intervals with ``end < start`` (or ``end <= start`` when
    half-open) have no containment semantics and are dropped, matching
    the SQL BETWEEN twin.  Non-key column names must be disjoint
    across the two frames (validated) — the output is simply all point
    columns + all interval columns.
    """
    if bucket_width < 1:
        raise ValueError("bucketed_interval_join: bucket_width must be >= 1")
    pk, ik = (on, on) if isinstance(on, str) or on is None else on
    overlap = (set(points.columns) & set(intervals.columns)) - (
        {pk} if pk == ik and pk is not None else set()
    )
    if overlap:
        raise ValueError(
            "bucketed_interval_join: overlapping non-key columns "
            f"{sorted(overlap)} — rename one side first"
        )

    w = int(bucket_width)
    # named numeric-line columns so the bucket index can use exact
    # integer `div` — epoch micros exceed 2^53, double division is NOT
    # exact.  (line - pmod(line, w)) is exactly divisible, and pmod is
    # non-negative, so `div` == floor division even for negative lines.
    bucket_of = f"(%s - pmod(%s, {w})) div {w}"
    p_line, p_unit = _to_line(point_col, points)
    s_line, s_unit = _to_line(start_col, intervals)
    e_line, e_unit = _to_line(end_col, intervals)
    # a LIST, not a name-keyed dict: point_col may share a NAME with an
    # interval bound (they live in different frames), and a dict would
    # overwrite the point's unit and let a real mismatch through
    units = [
        (f"point {point_col!r}", p_unit),
        (f"start {start_col!r}", s_unit),
        (f"end {end_col!r}", e_unit),
    ]
    if len({u for _, u in units}) != 1:
        raise ValueError(
            "bucketed_interval_join: point and interval columns resolve "
            f"to different numeric units {units} — a timestamp point "
            "joined against date intervals (or either against a raw "
            "integer) compares incompatible lines and silently returns "
            "wrong/empty results; cast all three to one unit first"
        )
    pts = points.withColumn("__ij_p", p_line)
    pts = pts.withColumn(
        "__ij_b", F.expr(bucket_of % ("__ij_p", "__ij_p"))
    )
    ivals = intervals.withColumn("__ij_s", s_line).withColumn(
        "__ij_e", e_line
    )
    live = (
        F.col("__ij_s") <= F.col("__ij_e")
        if end_inclusive
        else F.col("__ij_s") < F.col("__ij_e")
    )
    sb = F.expr(bucket_of % ("__ij_s", "__ij_s"))
    eb = F.expr(bucket_of % ("__ij_e", "__ij_e"))
    seq = F.when(
        eb - sb + 1 > max_buckets_per_interval,
        F.raise_error(
            F.concat(
                F.lit(
                    "bucketed_interval_join: an interval spans more than "
                    f"{max_buckets_per_interval} buckets at width {w} — "
                    "raise bucket_width (or the guard) instead of "
                    "exploding the plan: span="
                ),
                (F.col("__ij_e") - F.col("__ij_s")).cast("string"),
            )
        ),
    ).otherwise(F.sequence(sb, eb))
    ivals = ivals.filter(live).withColumn("__ij_b", F.explode(seq))
    join_keys = ["__ij_b"] if pk is None else [pk, "__ij_b"]
    if pk is not None and pk != ik:
        ivals = ivals.withColumnRenamed(ik, pk)
    contained = (F.col("__ij_p") >= F.col("__ij_s")) & (
        F.col("__ij_p") <= F.col("__ij_e")
        if end_inclusive
        else F.col("__ij_p") < F.col("__ij_e")
    )
    return (
        pts.join(ivals, on=join_keys, how="inner")
        .filter(contained)
        .drop("__ij_b", "__ij_p", "__ij_s", "__ij_e")
    )


__all__ = [
    "sessionize",
    "session_stats",
    "running_total",
    "asof_join",
    "bucketed_interval_join",
]
