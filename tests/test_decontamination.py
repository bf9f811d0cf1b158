"""Train/eval n-gram decontamination: exactness vs a brute-force
Python oracle, broadcast plan shape, and the hash-grams equivalence."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_toolz_spark.operators.decontamination import (
    decontaminated,
    eval_gram_set,
    ngram_decontaminate,
)


def _grams(text: str | None, n: int) -> set[str]:
    w = re.findall(r"[a-z0-9]+", (text or "").lower())
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _brute(train_rows, eval_rows, n):
    ev = set()
    for _, t in eval_rows:
        ev |= _grams(t, n)
    out = {}
    for i, t in train_rows:
        g = _grams(t, n)
        hits = len(g & ev)
        if hits:
            out[i] = (hits, len(g))
    return out


TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox naps all day long today"),
    (4, "entirely unrelated words about spark and parquet files"),
    (5, "short text"),
    (6, None),
    (7, "Punctuation, should NOT matter: the QUICK brown fox!"),
]
EVAL = [
    (100, "watch the quick brown fox jumps over everything"),
    (101, "five dozen liquor jugs were packed"),
]


def test_matches_brute_force_oracle(spark):
    for n in (2, 3, 4):
        train = spark.createDataFrame(TRAIN, "doc_id long, text string")
        ev = spark.createDataFrame(EVAL, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_hits"], r["n_grams"])
            for r in ngram_decontaminate(train, ev, n=n).collect()
        }
        assert got == _brute(TRAIN, EVAL, n), f"n={n}"


def test_hashed_and_string_grams_agree(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    a = sorted(
        map(tuple, ngram_decontaminate(train, ev, n=3, hash_grams=True)
            .select("doc_id", "n_hits").collect())
    )
    b = sorted(
        map(tuple, ngram_decontaminate(train, ev, n=3, hash_grams=False)
            .select("doc_id", "n_hits").collect())
    )
    assert a == b


def test_min_hits_threshold_and_ratio(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    flags = {r["doc_id"]: r for r in ngram_decontaminate(train, ev, n=3).collect()}
    brute = _brute(TRAIN, EVAL, 3)
    some_id = max(brute, key=lambda k: brute[k][0])
    thresh = brute[some_id][0]
    kept = ngram_decontaminate(train, ev, n=3, min_hits=thresh).collect()
    assert all(r["n_hits"] >= thresh for r in kept)
    assert any(r["doc_id"] == some_id for r in kept)
    for r in flags.values():
        assert r["hit_ratio"] == r["n_hits"] / r["n_grams"]


def test_decontaminated_removes_flagged_only(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    clean_ids = {
        r["doc_id"] for r in decontaminated(train, ev, n=3).collect()
    }
    flagged = set(_brute(TRAIN, EVAL, 3))
    assert clean_ids == {i for i, _ in TRAIN} - flagged


def test_eval_side_is_broadcast(spark):
    """The 100 TB contract: the corpus joins the eval gram set with a
    BroadcastHashJoin — the big side must never shuffle its grams."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    plan = (
        ngram_decontaminate(train, ev, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # and with broadcast_eval=False it degrades to a shuffled join
    plan2 = (
        ngram_decontaminate(train, ev, n=3, broadcast_eval=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan2


def test_eval_gram_set_distinct_and_hashed(spark):
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    strs = eval_gram_set(ev, n=3, hash_grams=False).collect()
    grams = {r["__gram"] for r in strs}
    expected = set()
    for _, t in EVAL:
        expected |= _grams(t, 3)
    assert grams == expected
    hashed = eval_gram_set(ev, n=3, hash_grams=True)
    assert dict(hashed.dtypes)["__gram"] == "bigint"
    assert hashed.count() == len(expected)


def test_short_and_null_texts_never_flag(spark):
    train = spark.createDataFrame(
        [(1, "one two"), (2, None), (3, "")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "one two three")], "doc_id long, text string")
    assert ngram_decontaminate(train, ev, n=3).count() == 0
