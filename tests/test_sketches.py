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


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _token_counts(documents):
    """Exact per-token occurrence counts over a small doc sample."""
    return (
        documents.limit(60)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .count()
    )


def test_cms_never_underestimates_and_exact_when_wide(spark, documents):
    from data_toolz_spark.functions.sketches import (
        cms_estimate,
        cms_sketch_table,
    )

    toks = (
        documents.limit(60)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    exact = {r["tok"]: r["count"] for r in _token_counts(documents).collect()}
    for w, d in ((16, 4), (1 << 16, 4)):
        sketch = cms_sketch_table(toks, "tok", d=d, w=w)
        est = {
            r["tok"]: r["cms_count"]
            for r in cms_estimate(
                sketch, toks.select("tok"), "tok", d=d, w=w
            ).collect()
        }
        assert est.keys() == exact.keys()
        # the one-sided CMS guarantee, at any width
        assert all(est[t] >= exact[t] for t in exact)
        if w == 1 << 16:
            # 64k cells vs a few thousand keys: collisions are rare
            # enough that at least 99% of keys estimate exactly
            exact_frac = sum(est[t] == exact[t] for t in exact) / len(exact)
            assert exact_frac >= 0.99, exact_frac


def test_cms_merge_matches_full_rebuild(spark, documents):
    """Incremental contract: sketches of three arbitrary increments
    fold (GROUP BY SUM) into EXACTLY the full-corpus sketch — same
    cells, same counts — so stored increments never drift."""
    from data_toolz_spark.functions.sketches import (
        cms_merge,
        cms_sketch_table,
    )

    toks = (
        documents.limit(60)
        .select(
            F.col("doc_id"),
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    full = {
        (r["row"], r["cell"]): r["count"]
        for r in cms_sketch_table(toks, "tok", d=4, w=64).collect()
    }
    parts = [
        cms_sketch_table(toks.filter(F.pmod("doc_id", F.lit(3)) == i), "tok", d=4, w=64)
        for i in range(3)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    folded = {
        (r["row"], r["cell"]): r["count"] for r in cms_merge(u).collect()
    }
    assert folded == full


def test_cms_portable_hash_matches_python_reference(spark):
    """portable=True cells must equal a pure-Python md5 reference —
    the property that makes the sketch reproducible in ANY engine with
    md5 (this is what the DuckDB oracle relies on)."""
    import hashlib

    from data_toolz_spark.functions.sketches import _cms_cell

    keys = ["the", "quick", "brown", "fox", "zh-字"]
    w, d = 1024, 4
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r["k"], r["row"]): r["cell"]
        for row in range(d)
        for r in df.select(
            "k",
            F.lit(row).alias("row"),
            _cms_cell(F.col("k"), row, w, True).alias("cell"),
        ).collect()
    }
    for k in keys:
        for row in range(d):
            h = int(
                hashlib.md5(f"{k}|{row}".encode("utf-8")).hexdigest()[:15], 16
            )
            assert got[(k, row)] == h % w


def test_cms_weighted_build(spark):
    """weight_col: building from pre-aggregated (key, n) rows must
    equal building from the exploded raw occurrences."""
    from data_toolz_spark.functions.sketches import cms_sketch_table

    raw = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    agg = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1)], "k string, n int"
    )
    s_raw = {
        (r["row"], r["cell"]): r["count"]
        for r in cms_sketch_table(raw, "k", d=3, w=32).collect()
    }
    s_agg = {
        (r["row"], r["cell"]): r["count"]
        for r in cms_sketch_table(agg, "k", d=3, w=32, weight_col="n").collect()
    }
    assert s_raw == s_agg


def test_cms_null_keys_excluded_and_unseen_estimates_zero(spark):
    from data_toolz_spark.functions.sketches import (
        cms_estimate,
        cms_sketch_table,
    )

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "k string"
    )
    sketch = cms_sketch_table(df, "k", d=4, w=1024)
    probe = spark.createDataFrame(
        [("a",), ("zzz-unseen",), (None,)], "k string"
    )
    est = {
        r["k"]: r["cms_count"]
        for r in cms_estimate(sketch, probe, "k", d=4, w=1024).collect()
    }
    assert est == {"a": 2, "zzz-unseen": 0}


def test_cms_validation():
    from data_toolz_spark.functions.sketches import (
        cms_estimate,
        cms_sketch_table,
    )

    with pytest.raises(ValueError, match="d"):
        cms_sketch_table(None, "k", d=0)
    with pytest.raises(ValueError, match="w"):
        cms_sketch_table(None, "k", w=1)


def test_cms_grouped_build_and_estimate(spark):
    """Grouped sketches: each group's keys estimate against that
    group's own cells — a key frequent in one group must not inflate
    its estimate in another (w wide enough that cross-key collisions
    don't mask the separation)."""
    from data_toolz_spark.functions.sketches import (
        cms_estimate,
        cms_sketch_table,
    )

    df = spark.createDataFrame(
        [("en", "a")] * 7 + [("en", "b")] * 2 + [("de", "a")] * 3,
        "lang string, k string",
    )
    sketch = cms_sketch_table(df, "k", ["lang"], d=4, w=4096)
    est = {
        (r["lang"], r["k"]): r["cms_count"]
        for r in cms_estimate(
            sketch,
            df.select("lang", "k"),
            "k",
            d=4,
            w=4096,
            group_cols=["lang"],
        ).collect()
    }
    assert est == {("en", "a"): 7, ("en", "b"): 2, ("de", "a"): 3}
