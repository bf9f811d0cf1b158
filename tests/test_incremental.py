"""Incremental dedup catalog: correctness over successive increments +
the no-exchange-on-catalog plan property that makes it scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.incremental import (
    append_to_catalog,
    build_fingerprint_catalog,
    novel_documents,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "delta epsilon"),
        (3, "alpha beta gamma"),  # dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_over_two_increments(spark, corpus, tmp_path):
    table = "fp_catalog_t1"
    build_fingerprint_catalog(
        corpus, table, n_buckets=4, path=str(tmp_path / "cat")
    )
    # catalog holds DISTINCT content with min-id representative
    cat = {r["fingerprint"]: r["first_id"] for r in spark.table(table).collect()}
    assert len(cat) == 2 and 1 in cat.values() and 2 in cat.values()

    inc1 = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),   # known content → not novel
            (11, "zeta eta"),           # novel
            (12, "zeta eta"),           # dup-within-increment of 11
            (13, "theta iota"),         # novel
        ],
        "doc_id long, text string",
    )
    novel = novel_documents(spark, inc1, table)
    got = {r["doc_id"] for r in novel.collect()}
    assert got == {11, 13}  # 10 known, 12 collapsed to 11

    append_to_catalog(novel, table)
    # an identical second increment is now fully known
    again = novel_documents(spark, inc1, table)
    assert again.count() == 0
    # but new content still surfaces
    inc2 = spark.createDataFrame(
        [(20, "kappa lambda")], "doc_id long, text string"
    )
    assert novel_documents(spark, inc2, table).count() == 1
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_catalog_side_joins_without_exchange(spark, corpus, tmp_path):
    """The property that makes the pattern scale: the (huge) catalog is
    pre-bucketed, so the anti-join plan has NO Exchange above the
    catalog scan — only the (small) increment shuffles."""
    table = "fp_catalog_t2"
    build_fingerprint_catalog(
        corpus, table, n_buckets=4, path=str(tmp_path / "cat")
    )
    inc = spark.createDataFrame(
        [(30, "mu nu xi")], "doc_id long, text string"
    )
    # at test scale the optimizer would broadcast the tiny catalog;
    # disable broadcast to see the 100 TB plan (SMJ over the bucket
    # layout), where only the increment side may shuffle
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            novel_documents(spark, inc, table)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # walk the plan text: the catalog scan subtree must not sit under
    # an Exchange (the increment side may shuffle freely)
    lines = plan.splitlines()
    cat_scan = [
        i
        for i, l in enumerate(lines)
        if "FileScan" in l and "cat" in l.lower()
    ]
    assert cat_scan, plan
    assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan
    for i in cat_scan:
        above = "\n".join(lines[max(0, i - 4): i])
        assert "Exchange" not in above, above
    spark.sql(f"DROP TABLE IF EXISTS {table}")
