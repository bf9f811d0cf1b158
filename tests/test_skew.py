"""Skew-mitigation operators: results must equal their unsalted twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.skew import (
    replicate_hot_keys_join,
    salted_aggregate,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds ~90% of rows — the hot-key shape
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain_groupby(spark, skewed):
    got = salted_aggregate(
        skewed,
        ["k"],
        {
            "total": ("sum", "v"),
            "n": ("count", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
            "mean": ("avg", "v"),
        },
        salt_buckets=8,
    )
    expected = skewed.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count("v").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.avg("v").alias("mean"),
    )
    g = {r["k"]: (r["total"], r["n"], r["lo"], r["hi"], round(r["mean"], 9)) for r in got.collect()}
    e = {r["k"]: (r["total"], r["n"], r["lo"], r["hi"], round(r["mean"], 9)) for r in expected.collect()}
    assert g == e


def test_salted_aggregate_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"x": ("median", "v")})


def test_replicated_join_matches_plain_join(spark, skewed):
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("tag")
    )
    got = replicate_hot_keys_join(
        skewed, dim, on="k", hot_keys=[0], salt_buckets=4
    )
    expected = skewed.join(dim, on="k")
    assert got.count() == expected.count()
    g = got.groupBy("k", "tag").count().collect()
    e = expected.groupBy("k", "tag").count().collect()
    assert sorted(map(tuple, g)) == sorted(map(tuple, e))


def test_replicated_join_salt_deterministic_per_row(spark, skewed):
    """Retry safety: the salt must be a pure function of row content
    (xxhash64 of the row), never a per-partition random draw — a
    retried task after an upstream shuffle must re-derive identical
    salts or rows duplicate/vanish at cluster scale (VERDICT r3)."""
    row_salt = F.pmod(F.xxhash64("k", "v"), F.lit(4)).cast("int")
    a = skewed.repartition(13).withColumn("s", row_salt)
    b = skewed.repartition(3, "v").withColumn("s", row_salt)  # different layout
    ga = {
        (r["k"], r["v"], r["s"]): r["n"]
        for r in a.groupBy("k", "v", "s").agg(F.count("*").alias("n")).collect()
    }
    gb = {
        (r["k"], r["v"], r["s"]): r["n"]
        for r in b.groupBy("k", "v", "s").agg(F.count("*").alias("n")).collect()
    }
    # identical (row → salt) assignment regardless of partitioning/order
    assert ga == gb
    # and every row got exactly one salt in range
    assert all(0 <= s < 4 for (_, _, s) in ga)


def test_approx_distinct_within_tolerance(spark, events):
    exact = events.select("user_id").distinct().count()
    approx = events.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a")
    ).first()["a"]
    assert abs(approx - exact) / exact < 0.05
