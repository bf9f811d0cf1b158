"""Inverted text index: search results vs brute-force text scan,
AND/OR semantics, incremental append, and the pushdown plan shape."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.search import (
    append_to_text_index,
    build_text_index,
    search_terms,
)


def _drop(spark, prefix):
    for t in ("ix_meta", "ix_postings"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(
            os.path.join(os.getcwd(), "spark-warehouse", f"{prefix}_{t}"),
            ignore_errors=True,
        )


@pytest.fixture()
def index(spark, documents, tmp_path):
    prefix = "t_search"
    _drop(spark, prefix)
    build_text_index(
        documents, prefix, n_buckets=8, path=str(tmp_path / "ix")
    )
    yield prefix
    _drop(spark, prefix)


def _brute(documents, terms, mode):
    toks = F.split(F.lower(F.col("text")), r"\s+")
    conds = [F.array_contains(toks, t.lower()) for t in terms]
    pred = conds[0]
    for c in conds[1:]:
        pred = (pred & c) if mode == "and" else (pred | c)
    return {r["doc_id"] for r in documents.filter(pred).collect()}


def test_and_or_match_brute_force(spark, documents, index):
    for terms, mode in (
        (["join", "hash"], "and"),
        (["join", "hash"], "or"),
        (["sort"], "and"),
        (["the", "spark", "query"], "and"),
    ):
        got = {
            r["id"] for r in search_terms(spark, index, terms, mode=mode).collect()
        }
        assert got == _brute(documents, terms, mode), (terms, mode)
        assert got  # corpus vocabulary makes every case non-empty


def test_case_folding_and_duplicate_terms(spark, documents, index):
    a = {
        r["id"]
        for r in search_terms(
            spark, index, ["JOIN", "join", "Hash"], mode="and"
        ).collect()
    }
    # dedup + lowercase → same as ["join", "hash"]
    assert a == _brute(documents, ["join", "hash"], "and")


def test_incremental_append(spark, documents, index):
    inc = spark.createDataFrame(
        [(990_001, "zzyzx quartz join"), (990_002, "zzyzx alone")],
        ["doc_id", "text"],
    )
    append_to_text_index(inc, index)
    got = {
        r["id"]
        for r in search_terms(spark, index, ["zzyzx"], mode="or").collect()
    }
    assert got == {990_001, 990_002}
    both = {
        r["id"]
        for r in search_terms(
            spark, index, ["zzyzx", "join"], mode="and"
        ).collect()
    }
    assert both == {990_001}


def test_pushdown_plan(spark, index):
    plan = (
        search_terms(spark, index, ["join", "hash"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(token" in plan


def test_validation(spark, index):
    with pytest.raises(ValueError):
        search_terms(spark, index, [])
    with pytest.raises(ValueError):
        search_terms(spark, index, ["x"], mode="xor")
