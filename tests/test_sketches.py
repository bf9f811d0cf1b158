"""HLL sketch surface: accuracy, and the incremental-rollup contract —
union over part-sketches is deterministic, order-independent, and
grouping-independent (what makes stored per-day sketch rows safe to
fold).  Union is NOT bit-identical to a one-shot sketch (dense
promotion differs); both must stay inside the sketch's error bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.functions.sketches import (
    approx_distinct,
    distinct_sketch_table,
    hll_estimate,
    hll_merge,
    hll_sketch,
    rollup_sketches,
)


def test_hll_estimate_within_tolerance(spark, documents):
    exact = documents.select("doc_id").distinct().count()
    est = documents.agg(
        hll_estimate(hll_sketch("doc_id")).alias("e")
    ).collect()[0]["e"]
    # lg_k=12 → ~1.6 % RSE; allow 5 sigma
    assert abs(est - exact) <= max(5, 0.08 * exact)


def test_approx_distinct_within_tolerance(spark, documents):
    exact = documents.select("lang").distinct().count()
    est = documents.agg(approx_distinct("lang").alias("e")).collect()[0]["e"]
    assert abs(est - exact) <= max(1, 0.1 * exact)


def test_union_grouping_invariance(spark, documents):
    """The incremental contract: unioning the SAME coverage of the data
    through different part boundaries (2-way vs 7-way disjoint splits)
    gives the same estimate — folding daily vs weekly cannot drift."""
    est = {}
    for parts in (2, 7):
        t = distinct_sketch_table(
            documents.withColumn(
                "part", F.pmod(F.col("doc_id"), F.lit(parts))
            ),
            ["part"],
            "doc_id",
        )
        est[parts] = rollup_sketches(t, []).collect()[0]["approx_distinct"]
    assert est[2] == est[7]
    exact = documents.select("doc_id").distinct().count()
    assert abs(est[2] - exact) <= max(5, 0.08 * exact)


def test_rollup_is_order_independent(spark, documents):
    """Same part-sketches, different physical layout → same estimates."""
    fine = distinct_sketch_table(
        documents.withColumn("half", F.pmod(F.col("doc_id"), F.lit(2))),
        ["lang", "half"],
        "doc_id",
    ).cache()
    try:
        a = {
            r["lang"]: r["approx_distinct"]
            for r in rollup_sketches(fine, ["lang"]).collect()
        }
        b = {
            r["lang"]: r["approx_distinct"]
            for r in rollup_sketches(
                fine.repartition(13).sortWithinPartitions("half"), ["lang"]
            ).collect()
        }
        assert a == b
    finally:
        fine.unpersist()


def test_incremental_fold_matches_full_rebuild(spark, documents):
    """Fold an increment's sketch into a stored corpus sketch: the
    estimate tracks a from-scratch build within the error bound, and
    folding the same parts in either order is identical."""
    corpus = documents.filter(F.col("doc_id") % 5 != 0)
    incr = documents.filter(F.col("doc_id") % 5 == 0)
    stored = corpus.agg(hll_sketch("doc_id").alias("sketch"))
    incr_sk = incr.agg(hll_sketch("doc_id").alias("sketch"))
    folded = (
        stored.unionByName(incr_sk)
        .agg(hll_estimate(hll_merge("sketch")).alias("e"))
        .collect()[0]["e"]
    )
    folded_rev = (
        incr_sk.unionByName(stored)
        .agg(hll_estimate(hll_merge("sketch")).alias("e"))
        .collect()[0]["e"]
    )
    assert folded == folded_rev
    exact = documents.select("doc_id").distinct().count()
    assert abs(folded - exact) <= max(5, 0.08 * exact)


def test_sketch_agg_is_partial_aggregable(spark, documents):
    """The plan must show two-phase aggregation (partial sketches cross
    the shuffle), not a raw-row exchange."""
    plan = (
        documents.groupBy("lang")
        .agg(hll_sketch("doc_id").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_lg_k_validation():
    with pytest.raises(ValueError):
        hll_sketch("x", lg_k=2)
