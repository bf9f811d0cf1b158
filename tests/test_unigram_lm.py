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


# ---------------------------------------------------------------------------
# bigram_logprob — stupid backoff
# ---------------------------------------------------------------------------


def _bg_ref(train_texts, score_texts, *, alpha=1.0, backoff=0.4):
    """Pure-Python stupid-backoff twin of bigram_logprob."""
    import collections

    uni: collections.Counter = collections.Counter()
    bi: collections.Counter = collections.Counter()
    for t in train_texts:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    v = len(uni)
    denom = n + alpha * (v + 1)
    out = {}
    for i, t in enumerate(score_texts):
        toks = t.lower().split()
        if len(toks) < 2:
            continue
        s = []
        for w1, w2 in zip(toks, toks[1:]):
            if (w1, w2) in bi and w1 in uni:
                s.append(-math.log(bi[(w1, w2)] / uni[w1]))
            else:
                s.append(
                    -math.log(backoff * ((uni.get(w2, 0) + alpha) / denom))
                )
        out[i] = math.floor(sum(s) / len(s) * 10000) / 10000
    return out


def test_bigram_matches_python_reference(spark):
    from data_toolz_spark.operators.text_analysis import (
        bigram_logprob,
        build_bigram_counts,
    )

    train = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
    ]
    score = [
        "the cat sat on the log",   # all-seen bigrams
        "the zebra sat quietly",    # OOV word -> backoff floor
        "cat dog mat log",          # seen words, unseen bigrams
        "single",                   # < 2 tokens -> excluded
        "the cat",                  # one seen bigram
    ]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], ["doc_id", "text"]
    )
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], ["doc_id", "text"]
    )
    vocab = build_vocab(tdf)
    bg = build_bigram_counts(tdf)
    got = {
        r["doc_id"]: r["bg_nll"]
        for r in bigram_logprob(sdf, bg, vocab).collect()
    }
    ref = _bg_ref(train, score)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-9), k


def test_bigram_fluent_beats_shuffled(spark):
    """A doc made of training bigrams scores better (lower NLL) than
    the same words in an order the model never saw."""
    from data_toolz_spark.operators.text_analysis import (
        bigram_logprob,
        build_bigram_counts,
    )

    train = ["the cat sat on the mat"] * 5
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], ["doc_id", "text"]
    )
    sdf = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "mat the on sat cat the")],
        ["doc_id", "text"],
    )
    vocab = build_vocab(tdf)
    bg = build_bigram_counts(tdf)
    got = {
        r["doc_id"]: r["bg_nll"]
        for r in bigram_logprob(sdf, bg, vocab).collect()
    }
    assert got[0] < got[1]


def test_bigram_validation(spark):
    from data_toolz_spark.operators.text_analysis import (
        bigram_logprob,
        build_bigram_counts,
        build_vocab as _bv,
    )

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    vocab = _bv(df)
    bg = build_bigram_counts(df)
    with pytest.raises(ValueError, match="alpha"):
        bigram_logprob(df, bg, vocab, alpha=0.0)
    with pytest.raises(ValueError, match="backoff"):
        bigram_logprob(df, bg, vocab, backoff=0.0)
    empty = _bv(df.filter(F.col("doc_id") < 0))
    with pytest.raises(ValueError, match="empty vocabulary"):
        bigram_logprob(df, bg, empty)


def test_bigram_min_count_filter(spark):
    from data_toolz_spark.operators.text_analysis import (
        build_bigram_counts,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d")], ["doc_id", "text"]
    )
    all_pairs = {
        (r["w1"], r["w2"]): r["bg_count"]
        for r in build_bigram_counts(df).collect()
    }
    assert all_pairs == {("a", "b"): 2.0, ("b", "a"): 1.0, ("c", "d"): 1.0}
    kept = {
        (r["w1"], r["w2"])
        for r in build_bigram_counts(df, min_count=2).collect()
    }
    assert kept == {("a", "b")}


# ---------------------------------------------------------------------------
# r12: entropy pruning of the bigram table (Stolcke 1998 adapted to
# stupid backoff) — the LM-compression step; pruning is row deletion
# because the scorer already backs off on absent bigrams
# ---------------------------------------------------------------------------


def _div_ref(train, alpha=1.0, backoff=0.4):
    """Python twin of score_bigram_divergence."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in train:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    v = len(uni)
    denom = n + alpha * (v + 1)
    return {
        (w1, w2): c * abs(
            math.log(c / uni[w1])
            - math.log(backoff * (uni[w2] + alpha) / denom)
        )
        for (w1, w2), c in bi.items()
    }


def test_bigram_prune_matches_twin_and_scorer(spark):
    from data_toolz_spark.operators.text_analysis import (
        bigram_logprob,
        build_bigram_counts,
        prune_bigram_counts,
        score_bigram_divergence,
    )

    train = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat sat on the mat again",
        "a cat and a dog",
    ]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], ["doc_id", "text"]
    )
    vocab = build_vocab(tdf)
    bg = build_bigram_counts(tdf)
    ref = _div_ref(train)

    scored = {
        (r["w1"], r["w2"]): r["divergence"]
        for r in score_bigram_divergence(bg, vocab).collect()
    }
    assert set(scored) == set(ref)
    for k in ref:
        assert scored[k] == pytest.approx(ref[k], rel=1e-12), k

    # epsilon in a clear gap of the reference divergences
    vals = sorted(ref.values())
    gaps = [(b - a, (a + b) / 2) for a, b in zip(vals, vals[1:]) if b > a]
    eps = max(gaps)[1]
    want_keep = {k for k, d in ref.items() if d >= eps}
    pruned = prune_bigram_counts(bg, vocab, epsilon=eps)
    got_keep = {(r["w1"], r["w2"]) for r in pruned.collect()}
    assert got_keep == want_keep
    assert pruned.columns == bg.columns

    # scorer semantics: a doc whose bigrams are ALL kept scores
    # identically under pruned and full models; a doc whose bigrams
    # were all pruned scores as pure backoff (empty bigram table)
    kept_doc = max(want_keep, key=lambda k: ref[k])
    dropped = set(ref) - want_keep
    docs = [(0, " ".join(kept_doc))]
    if dropped:
        d = max(dropped, key=lambda k: ref[k])
        docs.append((1, " ".join(d)))
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    full = {r["doc_id"]: r["bg_nll"]
            for r in bigram_logprob(sdf, bg, vocab).collect()}
    prn = {r["doc_id"]: r["bg_nll"]
           for r in bigram_logprob(sdf, pruned, vocab).collect()}
    empty_bg = bg.filter(F.lit(False))
    pure_backoff = {
        r["doc_id"]: r["bg_nll"]
        for r in bigram_logprob(sdf, empty_bg, vocab).collect()
    }
    assert prn[0] == full[0]
    if dropped:
        assert prn[1] == pure_backoff[1]

    # monotonicity: larger epsilon keeps a subset
    small = prune_bigram_counts(bg, vocab, epsilon=eps / 4)
    small_keep = {(r["w1"], r["w2"]) for r in small.collect()}
    assert want_keep <= small_keep


def test_bigram_prune_topk_and_groups(spark):
    from data_toolz_spark.operators.text_analysis import (
        build_bigram_counts,
        build_vocab as bv,
        prune_bigram_counts,
    )

    train = [
        ("en", "the cat sat on the mat"),
        ("en", "the cat sat on the log"),
        ("fr", "le chat dort le chat dort"),
    ]
    tdf = spark.createDataFrame(
        [(i, lang, t) for i, (lang, t) in enumerate(train)],
        ["doc_id", "lang", "text"],
    )
    # global top-k: deterministic (divergence DESC, w1, w2) prefix
    vocab = bv(tdf)
    bg = build_bigram_counts(tdf)
    ref = _div_ref([t for _, t in train])
    order = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    want3 = {k for k, _ in order[:3]}
    got3 = {
        (r["w1"], r["w2"])
        for r in prune_bigram_counts(bg, vocab, top_k=3).collect()
    }
    assert got3 == want3

    # per-group top-k: each language keeps ITS own k best
    gv = bv(tdf, group_col="lang")
    gbg = build_bigram_counts(tdf, group_col="lang")
    kept = prune_bigram_counts(
        gbg, gv, top_k=2, group_col="lang"
    ).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add((r["w1"], r["w2"]))
    assert set(by_lang) == {"en", "fr"}
    assert len(by_lang["en"]) == 2
    assert 1 <= len(by_lang["fr"]) <= 2

    # validation + null-divergence rows always kept
    with pytest.raises(ValueError, match="epsilon and/or top_k"):
        prune_bigram_counts(bg, vocab)
    alien = bg.unionByName(
        spark.createDataFrame(
            [("zz", "qq", 5.0)], "w1 string, w2 string, bg_count double"
        )
    )
    kept2 = prune_bigram_counts(alien, vocab, top_k=1).collect()
    pairs2 = {(r["w1"], r["w2"]) for r in kept2}
    assert ("zz", "qq") in pairs2  # unevaluable row survives
    assert len(pairs2) == 2       # ... outside the k budget
