"""unigram_logprob: exact scoring against a Python reference, OOV
dominance, and the broadcast-model plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.text_analysis import (
    build_vocab,
    unigram_logprob,
)


def _toy(spark):
    rows = [(1, "a a b"), (2, "a b c"), (3, "zz zz zz"), (4, "")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_scores(spark):
    df = _toy(spark)
    vocab = build_vocab(df, doc_id_col=None)  # a=3, b=2, c=1, zz=3
    got = {
        r["doc_id"]: r["nll"]
        for r in unigram_logprob(df, vocab, alpha=1.0).collect()
    }
    n, v = 9, 4
    denom = n + 1.0 * (v + 1)

    def nll(tf):
        return -math.log((tf + 1.0) / denom)

    exp1 = (2 * nll(3) + nll(2)) / 3
    exp2 = (nll(3) + nll(2) + nll(1)) / 3
    exp3 = nll(3)
    assert got[1] == pytest.approx(math.floor(exp1 * 10000) / 10000)
    assert got[2] == pytest.approx(math.floor(exp2 * 10000) / 10000)
    assert got[3] == pytest.approx(math.floor(exp3 * 10000) / 10000)
    assert 4 not in got  # zero-token doc drops out of the aggregate


def test_oov_ranks_as_tail(spark):
    df = _toy(spark)
    # model trained WITHOUT doc 3's token: zz becomes OOV
    vocab = build_vocab(df.filter(F.col("doc_id") != 3))
    got = {
        r["doc_id"]: r["nll"]
        for r in unigram_logprob(df, vocab).collect()
    }
    # the all-OOV doc must score strictly worse than every in-vocab doc
    assert got[3] > got[1] and got[3] > got[2]
    # OOV cost = the most expensive token in the model
    n, v = 6, 3
    oov = -math.log(1.0 / (n + 1.0 * (v + 1)))
    assert got[3] == pytest.approx(math.floor(oov * 10000) / 10000)


def test_rare_scores_worse_than_common(spark, documents):
    vocab = build_vocab(documents)
    scored = unigram_logprob(documents, vocab)
    rows = scored.limit(1).collect()
    assert rows and rows[0]["nll"] > 0


def test_validation(spark):
    with pytest.raises(ValueError):
        unigram_logprob(None, None, alpha=0.0)


def test_broadcast_model_plan(spark, documents):
    vocab = build_vocab(documents)
    plan = (
        unigram_logprob(documents, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
