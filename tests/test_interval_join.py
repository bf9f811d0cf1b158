"""bucketed_interval_join: differential vs the naive BETWEEN join,
pair uniqueness, half-open mode, timestamp lines, the explosion guard,
malformed-interval contract, equi-join plan shape."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.windows import bucketed_interval_join


def _pairs(df, pid="pid", iid="iid"):
    return {(r[pid], r[iid]) for r in df.select(pid, iid).collect()}


def _naive(points, intervals, key=None, end_inclusive=True):
    """Reference: the quadratic BETWEEN join the operator avoids."""
    j = points.alias("P").join(
        intervals.alias("I"),
        on=[
            F.col(f"P.{key}") == F.col(f"I.{key}")
        ] if key else [F.lit(True)],
        how="inner",
    ).filter(
        (F.col("P.p") >= F.col("I.s"))
        & (
            (F.col("P.p") <= F.col("I.e"))
            if end_inclusive
            else (F.col("P.p") < F.col("I.e"))
        )
    )
    return {(r["pid"], r["iid"]) for r in j.select("pid", "iid").collect()}


@pytest.fixture(scope="module")
def random_data(spark):
    import random

    rng = random.Random(13)
    pts = [
        (i, rng.choice("ab"), rng.randint(0, 3000)) for i in range(400)
    ]
    ivs = []
    for j in range(80):
        s = rng.randint(0, 2900)
        ivs.append((j, rng.choice("ab"), s, s + rng.randint(0, 400)))
    points = spark.createDataFrame(pts, "pid long, k string, p long")
    intervals = spark.createDataFrame(
        ivs, "iid long, k string, s long, e long"
    )
    return points, intervals


@pytest.mark.parametrize("width", [1, 7, 250, 5000])
def test_matches_naive_between_join(spark, random_data, width):
    points, intervals = random_data
    got = bucketed_interval_join(
        points,
        intervals,
        point_col="p",
        start_col="s",
        end_col="e",
        on="k",
        bucket_width=width,
    )
    assert _pairs(got) == _naive(points, intervals, key="k")
    # exactly-one-bucket-meeting ⇒ no duplicate pairs
    assert got.count() == len(_pairs(got))


def test_half_open_and_keyless(spark, random_data):
    points, intervals = random_data
    got = bucketed_interval_join(
        points.drop("k"),
        intervals.drop("k"),
        point_col="p",
        start_col="s",
        end_col="e",
        bucket_width=100,
        end_inclusive=False,
    )
    assert _pairs(got) == _naive(
        points, intervals, key=None, end_inclusive=False
    )


def test_timestamp_lines(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    points = spark.createDataFrame(
        [(i, ts(i * 10)) for i in range(30)], "pid long, p timestamp"
    )
    intervals = spark.createDataFrame(
        [(0, ts(5), ts(45)), (1, ts(100), ts(100)), (2, ts(290), ts(500))],
        "iid long, s timestamp, e timestamp",
    )
    got = bucketed_interval_join(
        points,
        intervals,
        point_col="p",
        start_col="s",
        end_col="e",
        bucket_width=60_000_000 * 7,  # 7-minute grid in micros
    )
    assert _pairs(got) == {
        *((p, 0) for p in (1, 2, 3, 4)),
        (10, 1),
        (29, 2),
    }
    # output column keeps its timestamp type
    assert dict(got.dtypes)["p"] == "timestamp"


def test_timestamp_ntz_lines(spark):
    """TIMESTAMP_NTZ inputs (the raw-parquet events schema in some
    testdata generations) bucket via the session-zone cast — a
    consistent monotone mapping applied to all three line columns."""
    t0 = datetime.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(1, t0 + datetime.timedelta(minutes=10))],
        "pid long, p timestamp_ntz",
    )
    intervals = spark.createDataFrame(
        [(0, t0, t0 + datetime.timedelta(minutes=20))],
        "iid long, s timestamp_ntz, e timestamp_ntz",
    )
    got = bucketed_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e",
        bucket_width=60_000_000,
    )
    assert _pairs(got) == {(1, 0)}


def test_malformed_intervals_dropped(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, p long")
    intervals = spark.createDataFrame(
        [(0, 10, 0), (1, 0, 10)], "iid long, s long, e long"
    )
    got = bucketed_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e",
        bucket_width=4,
    )
    assert _pairs(got) == {(1, 1)}


def test_explosion_guard_raises(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, p long")
    intervals = spark.createDataFrame(
        [(0, 0, 10_000_000)], "iid long, s long, e long"
    )
    with pytest.raises(Exception, match="spans more than"):
        bucketed_interval_join(
            points, intervals, point_col="p", start_col="s",
            end_col="e", bucket_width=2, max_buckets_per_interval=1000,
        ).collect()


def test_validation(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, p long")
    intervals = spark.createDataFrame(
        [(0, 0, 10)], "pid long, s long, e long"  # 'pid' collides
    )
    with pytest.raises(ValueError, match="overlapping non-key"):
        bucketed_interval_join(
            points, intervals, point_col="p", start_col="s",
            end_col="e", bucket_width=4,
        )
    with pytest.raises(ValueError, match="bucket_width"):
        bucketed_interval_join(
            points, intervals.withColumnRenamed("pid", "iid"),
            point_col="p", start_col="s", end_col="e", bucket_width=0,
        )
    with pytest.raises(ValueError, match="unsupported type"):
        bucketed_interval_join(
            points.withColumn("p", F.col("p").cast("double")),
            intervals.withColumnRenamed("pid", "iid"),
            point_col="p", start_col="s", end_col="e", bucket_width=4,
        )


def test_plan_is_equi_join(spark, random_data):
    points, intervals = random_data
    plan = (
        bucketed_interval_join(
            points, intervals, point_col="p", start_col="s",
            end_col="e", on="k", bucket_width=100,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_mixed_unit_columns_raise(spark):
    """r10 (ADVICE): a timestamp point joined against date intervals
    resolves to micros-vs-days — incompatible number lines that would
    silently produce wrong/empty output; the join must refuse."""
    points = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "pid int, p string"
    ).withColumn("p", F.col("p").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(1, "2024-01-01", "2024-01-05")], "iid int, s string, e string"
    ).withColumn("s", F.col("s").cast("date")).withColumn(
        "e", F.col("e").cast("date")
    )
    with pytest.raises(ValueError, match="different numeric units"):
        bucketed_interval_join(
            points, intervals, point_col="p", start_col="s",
            end_col="e", bucket_width=86_400_000_000,
        )
    # integral point vs timestamp bounds is just as wrong
    ipoints = spark.createDataFrame([(1, 100)], "pid int, p long")
    tintervals = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-02 00:00:00")],
        "iid int, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )
    with pytest.raises(ValueError, match="different numeric units"):
        bucketed_interval_join(
            ipoints, tintervals, point_col="p", start_col="s",
            end_col="e", bucket_width=1000,
        )
