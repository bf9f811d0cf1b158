"""rank_thresholds + bucket_by_thresholds (r10: CCNet-style quality
strata): exact-rank quantile cut points replayed by a pure-Python twin
and by DuckDB, then the head/middle/tail labeling semantics."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.text_analysis import (
    bucket_by_thresholds,
    rank_thresholds,
)


def py_threshold(values, num, den):
    """Smallest v with rank(<= v) >= ceil(num*N/den)."""
    vs = sorted(values)
    target = (num * len(vs) + den - 1) // den
    return vs[target - 1]


def test_rank_thresholds_exact_python_twin(spark):
    rng = random.Random(7)
    # heavy ties on purpose — rank semantics at ties is the hard part
    vals = [rng.randint(0, 30) for _ in range(500)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"]
    )
    qs = [(1, 3), (2, 3), (1, 2), (1, 1), (1, 500), (9, 10)]
    got = {
        (r["q_num"], r["q_den"]): r["threshold"]
        for r in rank_thresholds(df, "v", qs).collect()
    }
    for num, den in qs:
        assert got[(num, den)] == py_threshold(vals, num, den), (
            num,
            den,
        )


def test_rank_thresholds_duckdb_differential(spark):
    """The documented SQL replay (histogram → cumsum → min-over-target)
    produces the identical cut points — the same shape the qid oracle
    uses."""
    rng = random.Random(11)
    vals = [round(rng.uniform(0, 5), 4) for _ in range(400)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"]
    )
    got = {
        (r["q_num"], r["q_den"]): r["threshold"]
        for r in rank_thresholds(df, "v", [(1, 3), (2, 3)]).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT CAST(v AS DOUBLE) v FROM (VALUES "
        + ",".join(f"({v!r})" for v in vals)
        + ") AS t(v)"
    )
    for num, den in [(1, 3), (2, 3)]:
        want = con.execute(
            f"""
            WITH h AS (SELECT v, COUNT(*) c FROM t GROUP BY v),
            cum AS (SELECT v, SUM(c) OVER (ORDER BY v) cum,
                           SUM(c) OVER () n FROM h)
            SELECT MIN(v) FROM cum
            WHERE cum >= ({num} * n + {den} - 1) // {den}
            """
        ).fetchone()[0]
        assert got[(num, den)] == float(want)


def test_rank_thresholds_groups_and_nulls(spark):
    rows = (
        [("a", i) for i in range(10)]
        + [("b", 100 + i) for i in range(4)]
        + [("a", None), ("c", None)]
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        (r["g"], r["q_num"], r["q_den"]): r["threshold"]
        for r in rank_thresholds(
            df, "v", [(1, 2)], group_cols=["g"]
        ).collect()
    }
    # NULLs excluded: group a has 10 live values 0..9 → median rank 5
    assert got[("a", 1, 2)] == 4
    assert got[("b", 1, 2)] == 101
    # group c had only NULLs → no threshold row at all
    assert ("c", 1, 2) not in got


def test_rank_thresholds_validation(spark):
    df = spark.createDataFrame([(1, 1)], ["id", "v"])
    for bad in [(0, 3), (4, 3), (1, 0), (-1, 2)]:
        with pytest.raises(ValueError):
            rank_thresholds(df, "v", [bad])


def test_bucket_by_thresholds_ccnet_split(spark):
    vals = list(range(90))  # 0..89, thirds at 29 / 59
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], ["id", "score"]
    )
    thr = rank_thresholds(df, "score", [(1, 3), (2, 3)])
    out = bucket_by_thresholds(
        df, "score", thr, labels=("head", "middle", "tail")
    )
    counts = {
        r["ppl_bucket"]: r["n"]
        for r in out.groupBy("ppl_bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert counts == {"head": 30, "middle": 30, "tail": 30}
    # boundary semantics: score == threshold belongs to the LOWER
    # bucket (rank is <=)
    lab = {
        r["id"]: r["ppl_bucket"]
        for r in out.filter(F.col("score").isin(29.0, 30.0)).collect()
    }
    assert lab[29] == "head" and lab[30] == "middle"


def test_bucket_null_scores_and_default_labels(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, None)], ["id", "score"]
    )
    thr = rank_thresholds(df, "score", [(1, 3), (2, 3)])
    out = bucket_by_thresholds(df, "score", thr)
    lab = {r["id"]: r["ppl_bucket"] for r in out.collect()}
    assert lab == {0: "b0", 1: "b1", 2: "b2", 3: None}


def test_bucket_grouped_and_missing_group(spark):
    rows = [("a", i, float(i)) for i in range(6)] + [
        ("z", 99, 1.0)  # no thresholds for z → NULL bucket
    ]
    df = spark.createDataFrame(rows, ["g", "id", "score"])
    thr = rank_thresholds(
        df.filter(F.col("g") == "a"),
        "score",
        [(1, 2)],
        group_cols=["g"],
    )
    out = bucket_by_thresholds(
        df, "score", thr, group_cols=["g"], labels=("lo", "hi")
    )
    lab = {r["id"]: r["ppl_bucket"] for r in out.collect()}
    assert lab[0] == "lo" and lab[2] == "lo" and lab[3] == "hi"
    assert lab[99] is None


def test_rank_thresholds_repartition_invariance(spark):
    rng = random.Random(3)
    vals = [rng.randint(0, 50) for _ in range(300)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"]
    )
    a = sorted(
        map(tuple, rank_thresholds(df, "v", [(1, 4), (3, 4)]).collect())
    )
    b = sorted(
        map(
            tuple,
            rank_thresholds(
                df.repartition(17), "v", [(1, 4), (3, 4)]
            ).collect(),
        )
    )
    assert a == b


def test_grouped_bigram_lm_equals_per_language_models(spark):
    """r11 (VERDICT task 5): the grouped LM (group_col) must score
    every document exactly as a standalone LM trained on that
    language's subset alone — per-group vocab, bigram counts, AND
    backoff denominator all key on the group."""
    from data_toolz_spark.operators.text_analysis import (
        bigram_logprob,
        build_bigram_counts,
        build_vocab,
    )

    rng = random.Random(13)
    rows = []
    for i in range(120):
        # NULL is a REAL group (unresolved LID) — every third row
        lang = None if i % 3 == 2 else ("aa" if i % 2 == 0 else "bb")
        alpha = {"aa": "abcde", "bb": "vwxyz", None: "mnopq"}[lang]
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 4)))
            for _ in range(rng.randint(2, 18))
        ]
        rows.append((i, lang, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    grouped = {
        r["doc_id"]: r["bg_nll"]
        for r in bigram_logprob(
            df,
            build_bigram_counts(df, group_col="lang"),
            build_vocab(df, group_col="lang"),
            group_col="lang",
        ).collect()
    }
    for lang in ("aa", "bb", None):
        sub = df.filter(
            F.col("lang").isNull()
            if lang is None
            else F.col("lang") == lang
        )
        solo = {
            r["doc_id"]: r["bg_nll"]
            for r in bigram_logprob(
                sub, build_bigram_counts(sub), build_vocab(sub)
            ).collect()
        }
        for d, v in solo.items():
            assert grouped[d] == v, (lang, d)
    # a group with no vocabulary rows scores NULL instead of raising
    extra = spark.createDataFrame(
        [(999, "cc", "unseen language words here")],
        "doc_id long, lang string, text string",
    )
    got = {
        r["doc_id"]: r["bg_nll"]
        for r in bigram_logprob(
            df.union(extra),
            build_bigram_counts(df, group_col="lang"),
            build_vocab(df, group_col="lang"),
            group_col="lang",
        ).collect()
    }
    assert got[999] is None


def test_bucket_by_thresholds_null_group_rows_get_labels(spark):
    """r11 review fix: a NULL group is a real stratum — its rows must
    receive their own thresholds' labels, not NULL buckets."""
    rows = [(i, None if i < 30 else "en", float(i % 10)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, lang string, v double")
    thr = rank_thresholds(df, "v", [(1, 3), (2, 3)], group_cols=["lang"])
    out = bucket_by_thresholds(
        df, "v", thr, group_cols=["lang"],
        labels=("head", "middle", "tail"),
    ).collect()
    null_buckets = {r["ppl_bucket"] for r in out if r["lang"] is None}
    assert null_buckets == {"head", "middle", "tail"}
