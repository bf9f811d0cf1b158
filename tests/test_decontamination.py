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


# ---------------------------------------------------------------------------
# Embedding (semantic) decontamination
# ---------------------------------------------------------------------------


def test_embedding_decontaminate_matches_numpy_bruteforce(spark, embeddings):
    """Every corpus row's (nearest eval id, max cosine) must equal the
    numpy cross-product reference, and exactly the >= threshold rows
    are flagged."""
    import numpy as np

    from data_toolz_spark.operators.decontamination import (
        embedding_decontaminate,
    )
    from pyspark.sql import functions as F

    eval_df = embeddings.filter(F.col("vec_id") < 10)
    corpus = embeddings.filter(F.col("vec_id") >= 10)
    thr = 0.3  # max corpus-vs-eval cosine on this data is ~0.39

    ev = sorted(
        (
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
            for r in eval_df.collect()
        ),
        key=lambda t: t[0],
    )
    ev_mat = np.vstack([v / np.linalg.norm(v) for _, v in ev])
    want = {}
    for r in corpus.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(v)
        if n == 0:
            continue
        sims = ev_mat @ (v / n)
        b = int(sims.argmax())
        c = round(float(sims[b]), 6)
        if c >= thr:
            want[r["vec_id"]] = (ev[b][0], c)

    got = {
        r["vec_id"]: (r["nearest_eval_id"], r["max_cosine"])
        for r in embedding_decontaminate(
            corpus, eval_df, threshold=thr
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # threshold chosen so the test corpus flags


def test_embedding_decontaminate_empty_eval_and_null_vectors(spark, embeddings):
    from data_toolz_spark.operators.decontamination import (
        embedding_decontaminate,
    )
    from pyspark.sql import functions as F

    empty = embeddings.filter(F.lit(False))
    out = embedding_decontaminate(embeddings, empty, threshold=0.0)
    assert out.count() == 0
    assert out.columns == ["vec_id", "nearest_eval_id", "max_cosine"]

    # null/zero corpus vectors never flag, even at threshold 0
    weird = spark.createDataFrame(
        [(1, None), (2, [0.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    out2 = embedding_decontaminate(
        weird, embeddings.filter(F.col("vec_id") < 3), threshold=0.0
    )
    assert out2.count() == 0
