"""Distributed quality-classifier training — integer-exact logistic
regression with a hard sigmoid.

The standard corpus-curation move (GPT-3's Common-Crawl filter,
fastText quality classifiers) is: label a small set (curated = 1,
random crawl = 0), train a linear classifier over cheap text features,
score the whole corpus, keep/sample by score.  The features already
exist here (``quality_features``, ``web_artifact_features``,
``unigram_logprob``); this module adds the missing TRAIN step as a
batch-gradient-descent loop whose every quantity is integer arithmetic:

* features quantize once to ``floor(x · feature_scale)`` int64 (the
  ``clustering.py`` device);
* the model is integer weights (``w_real = w / 2^20``); the margin is
  an int64 dot product evaluated as ONE codegen'd column expression —
  weights are literals, so scoring is JVM-only, no UDF;
* the sigmoid is the HARD sigmoid ``clamp(z/4 + 1/2, 0, 1)``
  (Courbariaux et al. 2015's binarized-net surrogate) in scaled
  integer form — chosen over ``exp`` deliberately: cross-engine
  ``exp()`` can differ in the last ulp and GD feeds outputs back into
  the next iteration, so only a rational surrogate keeps the whole
  training loop bit-reproducible and SQL-replayable;
* per-iteration gradients are integer SUMS (associative — any
  partitioning gives the same model, pinned by tests), ONE aggregate
  row to the driver per iteration, floor-division updates.

Scale shape per iteration: one aggregate over the persisted quantized
feature frame — k+1 partial sums cross the shuffle, k+1 longs reach
the driver.  Training cost is n_iter scans; scoring is a single
codegen projection over any corpus.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scale bookkeeping: weights and probabilities share one scale so the
#: hard-sigmoid divisor collapses to the integer ``4 · feature_scale``
W_SCALE = 1 << 20
P_SCALE = 1 << 20


@dataclass(frozen=True)
class LogRegModel:
    """Integer weights (bias first), their scale, and the feature
    quantization the model was trained with — bounded driver state."""

    weights: tuple[int, ...]
    feature_cols: tuple[str, ...]
    feature_scale: int
    n_iter: int

    @property
    def real_weights(self) -> tuple[float, ...]:
        return tuple(w / W_SCALE for w in self.weights)


def _p_scaled(margin: Column, fscale: int) -> Column:
    """Hard sigmoid in P_SCALE units: clamp(m / (4·fscale) + ½, 0, 1).
    ``margin`` is in W_SCALE·fscale units and W_SCALE == P_SCALE, so
    the divisor is the plain integer 4·fscale; the pmod trick makes
    the division floor-exact for negative margins too (the double
    division is exact: |margin| stays far below 2^53 — O(1) features ×
    fscale ≤ 2^11 × weights bounded by n_iter·P_SCALE/2 ≤ 2^28)."""
    d = 4 * fscale
    fdiv = ((margin - F.pmod(margin, F.lit(d))) / d).cast("long")
    return F.greatest(
        F.lit(0),
        F.least(F.lit(P_SCALE), fdiv + F.lit(P_SCALE // 2)),
    )


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    n_iter: int = 20,
    lr_num: int = 1,
    lr_den: int = 2,
    feature_scale: int = 1024,
    persist: bool = True,
) -> LogRegModel:
    """Fit the integer-exact hard-sigmoid logistic regression.

    ``label_col`` must be 0/1 (NULL rows are dropped).  ``lr_num /
    lr_den`` is the learning rate as a ratio (default ½ — hard-sigmoid
    gradients are ¼-damped relative to the logistic, so larger rates
    than textbook are right); ``feature_scale`` bounds quantization
    error at 1/feature_scale per feature — scale features to O(1)
    upstream (ratios already are).  Fixed ``n_iter`` batch-GD rounds;
    weights start at zero, so iteration 1's probabilities are exactly
    ½ (pinned).
    """
    if n_iter < 1 or n_iter > 500:
        raise ValueError("logreg_fit: n_iter must be in [1, 500]")
    if lr_num < 1 or lr_den < 1:
        raise ValueError("logreg_fit: lr_num/lr_den must be positive")
    if feature_scale < 1:
        raise ValueError("logreg_fit: feature_scale must be >= 1")
    feats = list(feature_cols)
    if not feats:
        raise ValueError("logreg_fit: need at least one feature")
    base = df.filter(F.col(label_col).isin(0, 1))
    sel = [F.lit(int(feature_scale)).cast("long").alias("__f0")] + [
        F.floor(
            F.coalesce(F.col(c).cast("double"), F.lit(0.0))
            * feature_scale
        ).cast("long").alias(f"__f{i}")
        for i, c in enumerate(feats, start=1)
    ] + [(F.col(label_col).cast("long") * P_SCALE).alias("__y")]
    q = base.select(*sel)
    if persist:
        q = q.persist()
    try:
        k = len(feats) + 1
        # One pre-pass job doubles as the materializing count AND the
        # int64-overflow guard: each gradient term is |e|·|__f_j| ≤
        # P_SCALE·max|__f_j|, so the summed gradient is bounded by
        # n·P_SCALE·max|__f_j| — require that below 2^62 (headroom bit)
        # or the SUM can overflow a long (abort under ANSI, silent wrap
        # otherwise).  The fix is upstream: shrink feature_scale or
        # subsample the labeled set — quality-filter training sets are
        # small by design, so the bound only trips on misuse.
        stats = q.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.max(F.abs(F.col(f"__f{j}"))).alias(f"m{j}")
                for j in range(k)
            ],
        ).collect()[0]
        n = int(stats["n"])
        if n == 0:
            raise ValueError("logreg_fit: no labeled rows")
        for j in range(k):
            maxf = int(stats[f"m{j}"] or 0)
            if n * P_SCALE * max(maxf, 1) >= (1 << 62):
                raise ValueError(
                    "logreg_fit: gradient sum for feature "
                    f"{j} can overflow int64 (n={n}, max|f|={maxf}, "
                    f"P_SCALE={P_SCALE}) — reduce feature_scale, "
                    "rescale the feature to O(1), or subsample the "
                    "labeled set"
                )
        w = [0] * k
        for _ in range(n_iter):
            margin = sum(
                (F.col(f"__f{j}") * int(w[j]) for j in range(1, k)),
                F.col("__f0") * int(w[0]),
            )
            e = _p_scaled(margin, feature_scale) - F.col("__y")
            sums = q.agg(
                *[
                    F.sum(e * F.col(f"__f{j}")).alias(f"g{j}")
                    for j in range(k)
                ]
            ).collect()[0]
            for j in range(k):
                g = int(sums[f"g{j}"])
                # Δw = floor(lr · G / (n · fscale)) in W_SCALE units
                # (W_SCALE == P_SCALE cancels); Python // floors exactly
                w[j] -= (g * lr_num) // (lr_den * n * feature_scale)
        return LogRegModel(
            weights=tuple(int(x) for x in w),
            feature_cols=tuple(feats),
            feature_scale=int(feature_scale),
            n_iter=n_iter,
        )
    finally:
        if persist:
            q.unpersist()


def logreg_score(
    df: DataFrame,
    model: LogRegModel,
    *,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append the model's hard-sigmoid probability (double in [0, 1],
    exact multiple of 1/P_SCALE): ONE codegen projection — the weights
    are literals, so a 100 TB scoring pass is pure JVM expression work
    riding the scan.  NULL features read as 0 (the training contract)."""
    fscale = model.feature_scale
    margin = F.lit(int(model.weights[0])) * fscale
    for j, c in enumerate(model.feature_cols, start=1):
        fx = F.floor(
            F.coalesce(F.col(c).cast("double"), F.lit(0.0)) * fscale
        ).cast("long")
        margin = margin + F.lit(int(model.weights[j])) * fx
    p = _p_scaled(margin, fscale)
    return df.withColumn(out_col, p.cast("double") / P_SCALE)


def save_logreg_model(spark, model: LogRegModel, table: str) -> None:
    """Persist the model as a (k+1)-row table ``(idx, weight, feature,
    feature_scale, n_iter)`` (idx 0 = bias, feature NULL) — train the
    filter once, score every future ingest batch.  One job-atomic
    overwrite."""
    rows = [
        (0, int(model.weights[0]), None,
         int(model.feature_scale), int(model.n_iter))
    ] + [
        (j, int(model.weights[j]), model.feature_cols[j - 1],
         int(model.feature_scale), int(model.n_iter))
        for j in range(1, len(model.weights))
    ]
    spark.createDataFrame(
        rows,
        "idx int, weight long, feature string, feature_scale long, "
        "n_iter int",
    ).write.mode("overwrite").saveAsTable(table)


def load_logreg_model(spark, table: str) -> LogRegModel:
    """Rehydrate a :func:`save_logreg_model` table (bounded driver
    state, ordered by idx; idx 0 is the bias)."""
    rows = sorted(spark.table(table).collect(), key=lambda r: r["idx"])
    if not rows or [r["idx"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"load_logreg_model: {table} is empty or its idx column is "
            "not 0..k — not a save_logreg_model table"
        )
    return LogRegModel(
        weights=tuple(int(r["weight"]) for r in rows),
        feature_cols=tuple(r["feature"] for r in rows[1:]),
        feature_scale=int(rows[0]["feature_scale"]),
        n_iter=int(rows[0]["n_iter"]),
    )


__all__ = [
    "LogRegModel",
    "logreg_fit",
    "logreg_score",
    "save_logreg_model",
    "load_logreg_model",
]
