"""dsir_logweights: exact differential vs a pure-Python twin (portable
hashing), target-affinity ordering, smoothing defaults, validation."""

from __future__ import annotations

import hashlib
import math

import pytest

from data_toolz_spark.operators.sampling import dsir_logweights


def _bucket(feat: str, n_buckets: int) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % n_buckets


def _feats(text: str, *, lowercase=True, bigrams=True):
    toks = (text.lower() if lowercase else text).split()
    out = list(toks)
    if bigrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _ref(corpus, target, *, n_buckets=256, alpha=1.0):
    tc: dict = {}
    for t in target:
        for f in _feats(t):
            b = _bucket(f, n_buckets)
            tc[b] = tc.get(b, 0) + 1
    sc: dict = {}
    feats_per_doc = {}
    for i, t in corpus:
        fs = [_bucket(f, n_buckets) for f in _feats(t)]
        feats_per_doc[i] = fs
        for b in fs:
            sc[b] = sc.get(b, 0) + 1
    nt, ns = sum(tc.values()), sum(sc.values())
    dt, ds = nt + alpha * n_buckets, ns + alpha * n_buckets
    out = {}
    for i, fs in feats_per_doc.items():
        if not fs:
            continue
        s = sum(
            math.log(tc.get(b, 0) + alpha)
            - math.log(sc.get(b, 0) + alpha)
            - (math.log(dt) - math.log(ds))
            for b in fs
        )
        out[i] = math.floor(s * 10000) / 10000
    return out


def test_matches_python_reference(spark):
    corpus = [
        (1, "the cat sat on the mat"),
        (2, "stock market prices fell sharply today"),
        (3, "a cat and a dog played"),
        (4, ""),
        (5, "cat cat cat"),
    ]
    target = ["the cat sat quietly", "a small cat and dog"]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(
        [(t,) for t in target], "text string"
    )
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_logweights(
            cdf, tdf, n_buckets=256, portable=True
        ).collect()
    }
    ref = _ref(corpus, target, n_buckets=256)
    assert set(got) == set(ref)  # empty doc absent
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-9), k


def test_target_like_docs_rank_higher(spark, documents):
    """Docs sharing the target's vocabulary must outrank unrelated
    ones: use half the corpus as target, score everything — the target
    members themselves should sit at the top of the weight order."""
    target = documents.filter("doc_id % 7 = 0").select("text")
    got = dsir_logweights(
        documents, target, n_buckets=4096
    ).collect()
    w = {r["doc_id"]: r["dsir_logw"] for r in got}
    in_t = [v for k, v in w.items() if k % 7 == 0]
    out_t = [v for k, v in w.items() if k % 7 != 0]
    # mean separation, not per-doc domination (short docs are noisy)
    assert sum(in_t) / len(in_t) > sum(out_t) / len(out_t)


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="alpha"):
        dsir_logweights(df, df, alpha=0.0)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logweights(df, df, n_buckets=4)
    with pytest.raises(ValueError, match="empty target"):
        dsir_logweights(df, df.filter("doc_id < 0"))
