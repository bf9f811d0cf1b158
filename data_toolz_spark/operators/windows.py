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


__all__ = ["sessionize", "session_stats", "running_total", "asof_join"]
