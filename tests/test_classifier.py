"""Integer-exact hard-sigmoid logistic regression: differential vs a
pure-Python twin, repartition invariance, learning sanity (separable
data), scoring contract, validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.classifier import (
    P_SCALE,
    logreg_fit,
    logreg_score,
)


def _ref_fit(X, y, *, n_iter, lr_num=1, lr_den=2, fscale=1024):
    """Pure-Python integer twin of logreg_fit."""
    n, k = len(X), len(X[0]) + 1
    fx = [[fscale] + [int(np.floor(v * fscale)) for v in row] for row in X]
    w = [0] * k
    for _ in range(n_iter):
        g = [0] * k
        for row, label in zip(fx, y):
            m = sum(w[j] * row[j] for j in range(k))
            p = min(max((m - m % (4 * fscale)) // (4 * fscale)
                        + P_SCALE // 2, 0), P_SCALE)
            e = p - label * P_SCALE
            for j in range(k):
                g[j] += e * row[j]
        for j in range(k):
            w[j] -= (g[j] * lr_num) // (lr_den * n * fscale)
    return w


def _ref_score(w, row, fscale=1024):
    fx = [fscale] + [int(np.floor(v * fscale)) for v in row]
    m = sum(w[j] * fx[j] for j in range(len(w)))
    p = min(max((m - m % (4 * fscale)) // (4 * fscale)
                + P_SCALE // 2, 0), P_SCALE)
    return p / P_SCALE


def _data(seed=3, n=200):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    # separable-ish: label from a noisy linear rule
    y = ((X[:, 0] - 0.5 * X[:, 1] + 0.2 * rng.normal(size=n)) > 0).astype(
        int
    )
    return X, y


def _frame(spark, X, y):
    rows = [
        (i, float(a), float(b), float(c), int(lbl))
        for i, ((a, b, c), lbl) in enumerate(zip(X.tolist(), y.tolist()))
    ]
    return spark.createDataFrame(
        rows, "id long, f1 double, f2 double, f3 double, label int"
    )


def test_fit_and_score_match_python_reference(spark):
    X, y = _data()
    df = _frame(spark, X, y)
    model = logreg_fit(
        df, ["f1", "f2", "f3"], "label", n_iter=10, persist=False
    )
    ref_w = _ref_fit(X.tolist(), y.tolist(), n_iter=10)
    assert list(model.weights) == ref_w
    got = {
        r["id"]: r["quality_prob"]
        for r in logreg_score(df, model).collect()
    }
    for i, row in enumerate(X.tolist()):
        assert got[i] == pytest.approx(_ref_score(ref_w, row), abs=0)


def test_repartition_invariance(spark):
    X, y = _data(seed=9, n=150)
    df = _frame(spark, X, y)
    models = [
        logreg_fit(
            d, ["f1", "f2", "f3"], "label", n_iter=6, persist=False
        ).weights
        for d in (df.repartition(1), df.repartition(17))
    ]
    assert models[0] == models[1]


def test_learns_separable_rule(spark):
    X, y = _data(seed=5, n=300)
    df = _frame(spark, X, y)
    model = logreg_fit(df, ["f1", "f2", "f3"], "label", n_iter=30)
    scored = logreg_score(df, model)
    acc = (
        scored.filter(
            ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1))
            | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0))
        ).count()
        / 300
    )
    assert acc >= 0.9


def test_null_and_offlabel_rows(spark):
    df = spark.createDataFrame(
        [
            (1.0, 1),
            (None, 0),  # NULL feature reads as 0
            (2.0, None),  # NULL label dropped from training
            (0.5, 7),  # off-domain label dropped
            (-1.0, 0),
        ],
        "f1 double, label int",
    )
    model = logreg_fit(df, ["f1"], "label", n_iter=3, persist=False)
    assert len(model.weights) == 2
    scored = logreg_score(df, model)
    assert scored.count() == 5  # scoring never drops rows


def test_zero_weights_score_half(spark):
    from data_toolz_spark.operators.classifier import LogRegModel

    df = spark.createDataFrame([(3.7,)], "f1 double")
    m = LogRegModel(
        weights=(0, 0), feature_cols=("f1",), feature_scale=1024,
        n_iter=0,
    )
    assert logreg_score(df, m).collect()[0]["quality_prob"] == 0.5


def test_validation(spark):
    df = spark.createDataFrame([(1.0, 1)], "f1 double, label int")
    with pytest.raises(ValueError, match="n_iter"):
        logreg_fit(df, ["f1"], "label", n_iter=0)
    with pytest.raises(ValueError, match="lr_num"):
        logreg_fit(df, ["f1"], "label", lr_num=0)
    with pytest.raises(ValueError, match="feature_scale"):
        logreg_fit(df, ["f1"], "label", feature_scale=0)
    with pytest.raises(ValueError, match="at least one"):
        logreg_fit(df, [], "label")
    with pytest.raises(ValueError, match="no labeled rows"):
        logreg_fit(
            df.filter("label = 5"), ["f1"], "label", persist=False
        )


def test_model_save_load_roundtrip(spark):
    from data_toolz_spark.catalog import drop_stale_table
    from data_toolz_spark.operators.classifier import (
        load_logreg_model,
        save_logreg_model,
    )

    X, y = _data(seed=2, n=60)
    df = _frame(spark, X, y)
    model = logreg_fit(
        df, ["f1", "f2", "f3"], "label", n_iter=4, persist=False
    )
    table = "t_logreg_model"
    drop_stale_table(spark, table)
    save_logreg_model(spark, model, table)
    back = load_logreg_model(spark, table)
    assert back == model  # frozen dataclass equality: every field
    a = {r["id"]: r["quality_prob"]
         for r in logreg_score(df, model).collect()}
    b = {r["id"]: r["quality_prob"]
         for r in logreg_score(df, back).collect()}
    assert a == b
    drop_stale_table(spark, table)


def test_gradient_overflow_guard(spark):
    """r10 (ADVICE): the per-iteration gradient SUM is bounded by
    n·P_SCALE·max|__f| — a feature_scale big enough to push that past
    2^62 must raise up front (ANSI would abort mid-train; non-ANSI
    would silently wrap) instead of training on wrapped sums."""
    df = spark.createDataFrame(
        [(1.0, 1), (0.5, 0)], "x double, label int"
    )
    with pytest.raises(ValueError, match="overflow int64"):
        logreg_fit(
            df, ["x"], "label", n_iter=1, feature_scale=1 << 42,
        )
    # the same data at a sane scale trains fine
    m = logreg_fit(df, ["x"], "label", n_iter=2, feature_scale=1024)
    assert len(m.weights) == 2
