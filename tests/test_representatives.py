"""component_representatives + quality_aware_drop_list (r10):
quality-aware canonical selection per near-dup cluster — python-twin
differential, NULL/missing-score fallback, skew-salt invariance, and
the end-to-end pairs → CC → best-member drop list."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.dedup import (
    component_representatives,
    quality_aware_drop_list,
)


def _ref_reps(members, scores, *, keep_highest=True):
    """members: [(id, comp)], scores: {id: score|None} → {comp: kept}."""
    by_comp: dict = {}
    for i, c in members:
        by_comp.setdefault(c, []).append(i)
    out = {}
    for c, ids in by_comp.items():
        def key(i):
            s = scores.get(i)
            missing = s is None
            val = 0 if missing else (-s if keep_highest else s)
            return (missing, val, i)
        out[c] = min(ids, key=key)
    return out


def test_representatives_match_python_twin(spark):
    rng = random.Random(5)
    members = [(i, i % 7) for i in range(70)]
    scores = {
        i: (None if i % 11 == 0 else round(rng.uniform(0, 1), 3))
        for i in range(70)
    }
    comp_df = spark.createDataFrame(members, ["id", "component"])
    score_df = spark.createDataFrame(
        [(i, s) for i, s in scores.items()], "id long, q double"
    )
    for keep_highest in (True, False):
        got = {
            r["component"]: r["kept_id"]
            for r in component_representatives(
                comp_df,
                score_df,
                score_col="q",
                keep_highest=keep_highest,
            ).collect()
        }
        assert got == _ref_reps(
            members, scores, keep_highest=keep_highest
        ), keep_highest


def test_representatives_all_null_falls_back_to_min_id(spark):
    comp_df = spark.createDataFrame(
        [(5, 1), (3, 1), (9, 1)], ["id", "component"]
    )
    score_df = spark.createDataFrame(
        [(5, None), (3, None)], "id long, q double"
    )  # 9 missing entirely
    rows = component_representatives(
        comp_df, score_df, score_col="q"
    ).collect()
    assert all(r["kept_id"] == 3 for r in rows)
    assert all(r["kept_score"] is None for r in rows)
    assert len(rows) == 3  # one row per member


def test_representatives_tie_breaks_to_min_id(spark):
    comp_df = spark.createDataFrame(
        [(10, 0), (2, 0), (7, 0)], ["id", "component"]
    )
    score_df = spark.createDataFrame(
        [(10, 0.5), (2, 0.5), (7, 0.5)], "id long, q double"
    )
    rows = component_representatives(
        comp_df, score_df, score_col="q"
    ).collect()
    assert all(r["kept_id"] == 2 for r in rows)


def test_representatives_salt_invariance(spark):
    rng = random.Random(3)
    members = [(i, 0) for i in range(200)]  # one mega-component
    comp_df = spark.createDataFrame(members, ["id", "component"])
    score_df = spark.createDataFrame(
        [(i, round(rng.uniform(0, 1), 4)) for i in range(200)],
        "id long, q double",
    )
    base = None
    for s in (1, 4, 64):
        got = sorted(
            map(
                tuple,
                component_representatives(
                    comp_df, score_df, score_col="q", salt_buckets=s
                ).collect(),
            )
        )
        if base is None:
            base = got
        assert got == base, s
    with pytest.raises(ValueError):
        component_representatives(
            comp_df, score_df, score_col="q", salt_buckets=0
        )


def test_quality_aware_drop_list_end_to_end(spark):
    """Chain clusters {1,2,3} and {10,11}; best score wins, everything
    else drops — compare against the min-id policy to show the delta."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    scores = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5), (10, 0.2), (11, 0.8)],
        "doc_id long, q double",
    )
    dropped = sorted(
        r["drop_id"]
        for r in quality_aware_drop_list(
            pairs, scores, id_col="doc_id", score_col="q"
        ).collect()
    )
    assert dropped == [1, 3, 10]  # keeps 2 and 11, the best-scoring
    # keep_highest=False keeps the LOWEST score (perplexity semantics)
    dropped_low = sorted(
        r["drop_id"]
        for r in quality_aware_drop_list(
            pairs,
            scores,
            id_col="doc_id",
            score_col="q",
            keep_highest=False,
        ).collect()
    )
    assert dropped_low == [2, 3, 11]  # keeps 1 and 10
