"""Vocabulary construction + coverage: determinism, tie-break at the
top-V cut, scale-shape plan assertions, and the OOV-rate contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.text_analysis import (
    build_vocab,
    vocab_coverage,
)


def _toy(spark):
    rows = [
        (1, "b b b a a c"),
        (2, "a b D d"),
        (3, "d c c B"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_counts_and_doc_freq(spark):
    got = {
        r["token"]: (r["tf"], r["doc_freq"])
        for r in build_vocab(_toy(spark), doc_id_col="doc_id").collect()
    }
    # lowercased: a=3(2 docs) b=5(3 docs) c=3(2) d=3(2)
    assert got == {"a": (3, 2), "b": (5, 3), "c": (3, 2), "d": (3, 2)}


def test_topv_tie_break_deterministic(spark):
    # a, c, d all have tf=3 — the cut at top_v=2 must take 'a' (token
    # ASC) after 'b' (tf DESC)
    got = [
        (r["token"], r["rank"])
        for r in build_vocab(
            _toy(spark), doc_id_col="doc_id", top_v=2
        ).orderBy("rank").collect()
    ]
    assert got == [("b", 1), ("a", 2)]


def test_layout_invariance(spark):
    df = _toy(spark)
    a = build_vocab(df, top_v=3).orderBy("rank").collect()
    b = build_vocab(df.repartition(7), top_v=3).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_min_count_and_no_lowercase(spark):
    got = {
        r["token"]
        for r in build_vocab(
            _toy(spark), lowercase=False, min_count=3
        ).collect()
    }
    # case-sensitive: b=4 (B separate), a=3, c=3; d=2/D=1/B=1 drop
    assert got == {"a", "b", "c"}


def test_topv_plans_as_take_ordered(spark, documents):
    plan = (
        build_vocab(documents, doc_id_col="doc_id", top_v=50, rank_col=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort anywhere


def test_tf_only_skips_distinct_shuffle(spark, documents):
    with_df = (
        build_vocab(documents, doc_id_col="doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    tf_only = (
        build_vocab(documents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert tf_only.count("Exchange") < with_df.count("Exchange")


def test_validation():
    with pytest.raises(ValueError):
        build_vocab(None, top_v=0)  # validated before df is touched


def test_coverage_exact(spark):
    df = _toy(spark)
    vocab = build_vocab(df, top_v=2, rank_col=None)  # {b, a}
    row = vocab_coverage(df, vocab).collect()[0]
    # tokens total 14; a(3)+b(5)=8 covered
    assert (row["total_tokens"], row["covered_tokens"]) == (14, 8)
    assert row["coverage"] == pytest.approx(0.5714, abs=1e-4)


def test_coverage_grouped_and_broadcast(spark, documents):
    vocab = build_vocab(documents, top_v=10, rank_col=None)
    cov = vocab_coverage(documents, vocab, group_cols=("lang",))
    plan = cov._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = cov.collect()
    assert rows and all(0.0 <= r["coverage"] <= 1.0 for r in rows)
    # full vocab ⇒ full coverage
    full = build_vocab(documents, rank_col=None)
    row = vocab_coverage(documents, full).collect()[0]
    assert row["covered_tokens"] == row["total_tokens"]


def test_tfidf_exact_scores(spark):
    """TF-IDF against a hand-computed reference on a toy corpus."""
    import math

    from data_toolz_spark.operators.text_analysis import tfidf_terms

    df = _toy(spark)  # 1:"b b b a a c" 2:"a b D d" 3:"d c c B"
    vocab = build_vocab(df, doc_id_col="doc_id")
    got = {
        (r["doc_id"], r["token"]): (r["tf"], r["score"], r["rank"])
        for r in tfidf_terms(df, vocab, top_k=2).collect()
    }

    def idf(dfreq):
        return math.log(4.0 / (dfreq + 1.0)) + 1.0

    def trunc(x):
        return math.floor(x * 10000) / 10000

    # doc 1: b tf=3 (df=3), a tf=2 (df=2), c tf=1 (df=2)
    assert got[(1, "b")] == (3, trunc(3 * idf(3)), 1)
    assert got[(1, "a")] == (2, trunc(2 * idf(2)), 2)
    assert (1, "c") not in got  # cut at top_k=2
    # doc 3 ("d c c B"): c tf=2 ranks 1; d (tf=1, df=2) outscores
    # b (tf=1, df=3 → idf exactly 1.0) on idf alone
    assert got[(3, "c")][2] == 1
    assert got[(3, "d")] == (1, trunc(idf(2)), 2)
    assert (3, "b") not in got


def test_tfidf_requires_doc_freq_and_validates(spark):
    from data_toolz_spark.operators.text_analysis import tfidf_terms

    df = _toy(spark)
    with pytest.raises(ValueError, match="doc_freq"):
        tfidf_terms(df, build_vocab(df))  # tf-only vocab
    with pytest.raises(ValueError, match="top_k"):
        tfidf_terms(df, build_vocab(df, doc_id_col="doc_id"), top_k=0)


def test_tfidf_plan_broadcast_no_global_sort(spark, documents):
    from data_toolz_spark.operators.text_analysis import tfidf_terms

    vocab = build_vocab(documents, doc_id_col="doc_id")
    plan = (
        tfidf_terms(documents, vocab, n_docs=500)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the only sort is the per-doc window partition sort
    assert "rangepartitioning" not in plan.lower()
