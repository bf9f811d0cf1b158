"""Structured Streaming operators over an events-style table.

The reference has no streaming surface (SURVEY §2.8); these are the
extension operators (§2.9 X6) expressed the Spark-native way:
``readStream`` source → declarative transformation → ``writeStream``
sink, with event-time watermarks bounding state.  Every operator here
has a batch twin in ``operators.windows`` computing the same answer on
a static frame — the tests run both and compare.

Scale notes: state size is the failure mode at 100 TB/day.  Watermarks
cap every stateful operator below; ``session_window`` merges state per
(user, open-session) instead of per event; the custom
``applyInPandasWithState`` runner keeps one small record per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession,
    path: str,
    *,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet events directory.

    Schema is mandatory for file streams; by default it is inferred
    once from a batch read of the same path (driver-side, one listing).
    ``maxFilesPerTrigger`` throttles replay for reprocessing runs.
    """
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling/sliding event-time counts with late-data handling.

    Watermark bounds state: windows older than max(event time) −
    ``watermark`` are finalized and evicted.  Output columns are
    flattened (window_start, window_end, …, n_events, total_value) so
    sinks and oracles see plain columns.
    """
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("__w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions via ``session_window`` (merging session state).

    The streaming twin of ``operators.windows.sessionize``: Spark keeps
    one state entry per open session and merges/extends it as events
    arrive, closing the session once the watermark passes start+gap.
    """
    gap = f"{int(gap_minutes * 60)} seconds"
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("__s"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            user_col,
            "n_events",
            "total_value",
        )
    )


def running_user_totals_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
):
    """Custom stateful operator: per-user cumulative totals.

    ``applyInPandasWithState`` keeps one (count, total) record per user
    and emits an updated row per micro-batch — the
    arbitrary-stateful-processing escape hatch for semantics the
    built-in windowed aggregations cannot express.  State is a single
    tuple per key, so memory is O(distinct users), not O(events).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_ddl = f"{user_col} bigint, n_events bigint, total double"
    state_ddl = "n bigint, total double"

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "total": [round(total, 2)]}
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_ddl,
            stateStructType=state_ddl,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    The ingestion-pipeline twin of ``operators.dedup.dedup_exact``:
    at-least-once upstream delivery (replays, producer retries) becomes
    exactly-once downstream by keying on ``key_cols`` —
    ``dropDuplicatesWithinWatermark`` keeps one fingerprint per key
    only until the watermark passes it, so state is bounded by the
    duplicate-arrival horizon instead of growing with the full stream
    history (the difference between a deployable dedup and an OOM at
    100 TB/day).  A duplicate arriving later than ``watermark`` after
    the first copy is NOT suppressed — choose the horizon from the
    upstream redelivery SLA.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with every right event of the same key whose time lies in
    ``[left.ts, left.ts + within]`` — the click→purchase attribution /
    request→response correlation shape.

    This is the Structured Streaming operator whose STATE design
    matters most at scale: both sides buffer rows in the state store
    until the other side's watermark proves no future match can
    arrive, so the two ``withWatermark`` calls plus the inequality
    time condition are what make state BOUNDED (without the time
    bound, a stream-stream join must keep every row forever — Spark
    rejects it in append mode).  State per key is O(events within the
    watermark + interval horizon), independent of stream history.

    Outer variants (``how="left_outer"`` etc.) emit unmatched rows
    only once the watermark closes their interval — the same
    finalization rule windowed aggregates follow.

    Columns are prefixed (``l_``/``r_``) so the output schema is
    sink-stable regardless of the input schemas' overlap.
    """
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    lsel = lw.select(
        [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    )
    rsel = rw.select(
        [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    lk, rk = f"{left_prefix}{key_col}", f"{right_prefix}{key_col}"
    lt, rt = f"{left_prefix}{ts_col}", f"{right_prefix}{ts_col}"
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {within}"))
    )
    return lsel.join(rsel, on=cond, how=how)


def run_to_parquet_sink(
    stream_df: DataFrame,
    *,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain all available input into a parquet file sink.

    The production sink shape: ``checkpointLocation`` gives
    exactly-once file output across restarts (offset log + committed
    file manifest), ``availableNow`` drains the current backlog then
    stops — the batch-refresh deployment mode.  In append mode a
    watermarked aggregation emits only FINALIZED windows (watermark
    passed), so a bounded drain writes the closed windows and holds the
    open tail in state for the next run — verified against the batch
    cutoff in tests/test_streaming.py.
    """
    query = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def run_to_memory_sink(
    stream_df: DataFrame,
    *,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain all available input into an in-memory table (test helper).

    ``trigger(availableNow=True)`` processes the backlog then stops —
    the deterministic batch-replay mode used by the tests to compare
    streaming results against their batch twins.
    """
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "sessionize_stream",
    "running_user_totals_stream",
    "dedup_stream",
    "interval_join_streams",
    "run_to_memory_sink",
    "run_to_parquet_sink",
]
