"""Distributed k-means over embedding columns — integer-exact Lloyd's.

Corpus curation needs cluster structure: cluster-balanced sampling,
topic-stratified mixtures, SemDeDup-style per-cluster dedup, and IVF
coarse quantizers all start from "assign every vector to a centroid".
The existing similarity stack trains its quantizers on a DRIVER-side
sample (``similarity._kmeans_numpy`` — right for an index whose cells
only need to be roughly balanced); this module is the full-corpus
twin: every ASSIGNMENT pass is distributed (one Arrow-batched scan, no
shuffle of vectors beyond a k×dim-row partial aggregate), so the model
reflects all the data, not a sample.

Why INTEGER-exact (the design decision): float Lloyd's is not
reproducible across engines or even across partitionings — a float sum
depends on addition order, so the same corpus can converge to
different models on different cluster layouts, and no SQL oracle can
replay it bit-for-bit.  This implementation quantizes vectors ONCE to
integers (``floor(x * scale)`` — floor, not round: round ties break
differently across engines), after which

* distances are int64 arithmetic — exact, order-free;
* centroid updates are integer SUM + COUNT (associative — any
  partitioning gives bit-identical sums) with a floor-divided integer
  centroid;
* argmin ties break to the smallest cluster id.

Every step is therefore deterministic under repartitioning (pinned by
tests) and replayable in ANSI SQL — the same portability contract as
``simhash64(portable_hash=True)`` and the md5 sketch cells.  At
``scale=1024`` the quantization error per dimension is < 1e-3 of the
input unit — noise relative to k-means' own objective landscape; pass
a larger scale when inputs are tiny.  (Jumping to float centroids
buys nothing a bigger scale doesn't.)

Scale shape per iteration (Lloyd 1982; MacQueen 1967):

* ASSIGN: one ``mapInPandas`` scan; each Arrow batch computes the
  full (batch × k) int64 distance matrix via one matmul identity
  ``|x−c|² = |x|² − 2x·c + |c|²`` and emits (cluster, vector);
* UPDATE: posexplode + partial-combined groupBy(cluster, dim) — only
  k·dim rows per task cross the shuffle;
* k·dim (sum, count) cells collect to the driver (BOUNDED state:
  k=1024 × dim=1024 is 8 MB — documented contract), floor-divide,
  broadcast back inside the next kernel closure.

Empty clusters keep their previous center (the standard Lloyd's
convention that keeps k fixed).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class KMeansModel:
    """Trained integer-exact k-means state.

    ``centers`` is a (k × dim) int64 array in QUANTIZED space —
    bounded driver state by construction.  ``scale`` is the
    quantization factor every assignment must reuse.
    """

    centers: np.ndarray
    scale: int
    n_iter: int
    seed: int

    @property
    def k(self) -> int:
        return int(self.centers.shape[0])

    @property
    def dim(self) -> int:
        return int(self.centers.shape[1])


def _validate(k: int, n_iter: int, scale: int, dim: int) -> None:
    if not 2 <= k <= 4096:
        raise ValueError("kmeans: k must be in [2, 4096]")
    if not 1 <= n_iter <= 100:
        raise ValueError("kmeans: n_iter must be in [1, 100]")
    if scale < 1:
        raise ValueError("kmeans: scale must be >= 1")
    if dim < 1:
        raise ValueError("kmeans: dim must be >= 1")


def _quantized(df: DataFrame, id_col: str, vec_col: str, dim: int,
               scale: int) -> DataFrame:
    """(id, int64-vector) frame: floor(float64(x) * scale) per element.

    floor (not round) — IEEE float64 multiply is deterministic and
    floor is unambiguous, so any engine reproduces the exact grid.
    NULL, wrong-length, and non-finite vectors are excluded (no
    position in space; also keeps ``floor`` inside long range under
    ANSI mode).
    """
    v = F.col(vec_col).cast("array<double>")
    finite = F.forall(
        v, lambda x: x.isNotNull() & ~F.isnan(x) & (F.abs(x) < 1e15)
    )
    return df.filter(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
        & finite
    ).select(
        F.col(id_col),
        F.transform(
            v, lambda x: F.floor(x * scale).cast("long")
        ).alias("__qv"),
    )


def _seed_centers(q: DataFrame, id_col: str, k: int, seed: int
                  ) -> np.ndarray:
    """Deterministic init: the k vectors with the smallest
    ``md5(id|seed)`` hex (ties by id) — an engine-portable shuffle of
    the corpus, replayable as ORDER BY md5(...) LIMIT k in SQL."""
    rows = (
        q.select(
            id_col,
            "__qv",
            F.md5(
                F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}"))
            ).alias("__h"),
        )
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(
            f"kmeans: need at least k={k} usable vectors, got {len(rows)}"
        )
    return np.asarray([r["__qv"] for r in rows], dtype=np.int64)


def _assign_kernel(centers: np.ndarray, id_type: str, *,
                   with_vec: bool, with_dist: bool):
    """mapInPandas kernel: per Arrow batch, int64 argmin over the
    matmul-identity distance matrix; ties break to the first (lowest)
    cluster index, matching ORDER BY d2, cluster in SQL."""
    c = centers.astype(np.int64)
    c_sq = (c * c).sum(axis=1)  # (k,)

    fields = [f"{id_type}", "cluster int"]
    schema = f"id_out {id_type}, cluster int"
    if with_vec:
        schema += ", qv array<long>"
    if with_dist:
        schema += ", dist2 long"
    del fields

    def kernel(batches):
        for pdf in batches:
            vals = pdf["__qv"].tolist()
            ids = pdf["id_out"].tolist()
            if not vals:
                continue
            x = np.asarray(vals, dtype=np.int64)  # (n, dim)
            # |x−c|² = |x|² − 2 x·c + |c|² — one (n × k) int64 matmul
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2 * (x @ c.T)
                + c_sq[None, :]
            )
            best = d2.argmin(axis=1)  # first min = smallest cluster
            out = {"id_out": ids, "cluster": best.astype(np.int32)}
            if with_vec:
                out["qv"] = list(x)
            if with_dist:
                out["dist2"] = d2[np.arange(len(vals)), best]
            yield pd.DataFrame(out)

    return kernel, schema


def kmeans_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 8,
    n_iter: int = 5,
    seed: int = 42,
    scale: int = 1024,
    persist: bool = True,
) -> KMeansModel:
    """Fit integer-exact Lloyd's k-means over the full corpus.

    ``n_iter`` full assign+update rounds from the md5-seeded init
    (fixed iteration count, not a convergence test — deterministic
    work, and Lloyd's is monotone so extra rounds never hurt).
    ``persist`` caches the quantized (id, vector) frame across the
    n_iter + 1 scans; at small SF the cache can cost more than the
    re-scan (same finding as the vocab A/B), at 100 TB you want it.
    """
    _validate(k, n_iter, scale, dim)
    id_type = df.schema[id_col].dataType.simpleString()
    q = _quantized(df, id_col, vec_col, dim, scale).withColumnRenamed(
        id_col, "id_out"
    )
    if persist:
        q = q.persist()
    try:
        centers = _seed_centers(q, "id_out", k, seed)
        for _ in range(n_iter):
            kernel, schema = _assign_kernel(
                centers, id_type, with_vec=True, with_dist=False
            )
            assigned = q.mapInPandas(kernel, schema)
            # UPDATE: partial-combined (cluster, dim) integer sums —
            # k·dim rows per task cross the shuffle, k·dim rows total
            # reach the driver (bounded state)
            cells = (
                assigned.select(
                    "cluster", F.posexplode("qv").alias("pos", "val")
                )
                .groupBy("cluster", "pos")
                .agg(
                    F.sum("val").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            new_centers = centers.copy()  # empty cluster keeps center
            sums = np.zeros((k, dim), dtype=np.int64)
            counts = np.zeros(k, dtype=np.int64)
            for r in cells:
                sums[r["cluster"], r["pos"]] = r["s"]
                counts[r["cluster"]] = r["n"]
            live = counts > 0
            # floor division (Python // semantics): exact integer
            # centroid, engine-portable as floor(sum / count)
            new_centers[live] = np.floor_divide(
                sums[live], counts[live, None]
            )
            centers = new_centers
    finally:
        if persist:
            q.unpersist()
    return KMeansModel(
        centers=centers, scale=scale, n_iter=n_iter, seed=seed
    )


def kmeans_assign(
    df: DataFrame,
    model: KMeansModel,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: str | None = None,
) -> DataFrame:
    """Assign every vector to its nearest model centroid: ONE Arrow
    scan, no shuffle — the centers ride inside the kernel closure.
    Output: (``id_col``, ``cluster_col`` [, ``dist_col``]); ``dist_col``
    is the exact int64 squared distance in quantized space.  NULL /
    wrong-length vectors are excluded (same contract as fit).
    """
    id_type = df.schema[id_col].dataType.simpleString()
    q = _quantized(df, id_col, vec_col, model.dim, model.scale
                   ).withColumnRenamed(id_col, "id_out")
    kernel, schema = _assign_kernel(
        model.centers, id_type, with_vec=False, with_dist=dist_col is not None
    )
    out = q.mapInPandas(kernel, schema).withColumnRenamed(
        "id_out", id_col
    ).withColumnRenamed("cluster", cluster_col)
    if dist_col is not None:
        out = out.withColumnRenamed("dist2", dist_col)
    return out


def kmeans_cluster_profile(
    assigned: DataFrame,
    *,
    cluster_col: str = "cluster",
    dist_col: str = "dist2",
) -> DataFrame:
    """Per-cluster size + inertia from an assignment frame — one
    partial-aggregable pass; the monitoring hook a curation pipeline
    joins against yesterday's to catch drift in cluster balance."""
    return assigned.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(dist_col).alias("inertia"),
    )


@dataclass(frozen=True)
class KCenterResult:
    """Greedy k-center selection state: the picked ids in selection
    order, their quantized vectors (m × dim — bounded driver state,
    same contract as ``KMeansModel.centers``), and the coverage radii
    sequence: ``len(radii) == m - 1`` — ``radii[i]`` is the squared
    distance of pick ``i + 1`` to the first ``i + 1`` selected centers
    (pick 0, the seed, has no entry), i.e. the corpus coverage radius
    the selection had BEFORE that pick joined — the classic
    diminishing-returns curve to plot when choosing m."""

    ids: tuple
    centers: np.ndarray
    radii: tuple[int, ...]
    scale: int
    seed: int

    @property
    def m(self) -> int:
        return int(self.centers.shape[0])

    def as_kmeans_model(self) -> KMeansModel:
        """View the selection as a centroid model so
        :func:`kmeans_assign` can assign every corpus vector to its
        nearest selected exemplar (cluster id = pick order)."""
        return KMeansModel(
            centers=self.centers, scale=self.scale, n_iter=0,
            seed=self.seed,
        )


def kcenter_select(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    m: int = 8,
    seed: int = 42,
    scale: int = 1024,
    persist: bool = True,
) -> KCenterResult:
    """Greedy farthest-point k-center selection (Gonzalez 1985) over
    an embedding corpus — the DIVERSITY complement to the similarity
    stack's dedup: where SemDeDup drops what is redundant, k-center
    picks the ``m`` exemplars that best COVER the corpus (every point
    within the returned radius of some pick; the greedy set is a
    2-approximation of the optimal k-center cover).  Training-data
    uses: seed sets for active labeling, diverse eval panels, coreset
    pre-selection before expensive human/model scoring (Sener &
    Savarese 2018 use exactly this rule for coreset selection).

    Integer-exact like :func:`kmeans_fit` (same ``floor(x·scale)``
    grid, same int64 distance identity), so the ENTIRE selection
    sequence is a pure function of (ids, seed) — repartition-
    invariant and SQL-replayable: start from the smallest
    ``md5(id|seed)`` vector, then ``m−1`` rounds of "the point whose
    min-distance to the selected set is LARGEST" (ties → smallest
    id, exactly ``ORDER BY d2 DESC, id LIMIT 1``).

    Scale shape per round: one Arrow matmul scan computes every
    point's min-distance to the ≤ m selected centers riding in the
    kernel closure (no shuffle of vectors), and ONE (d2, id) row
    reaches the driver via TakeOrdered — total O(n·m) distance work
    across m rounds, driver state m×dim.  The recompute-per-round
    design is deliberate: an incremental running-min column would
    need a checkpoint chain (plan growth, files), while the
    stateless rescan is the same cost shape as ``kmeans_fit`` and
    keeps every round independently replayable.

    Stops early (returns < m picks) when the farthest remaining point
    is at distance 0 — the corpus has fewer distinct vectors than
    ``m``, and duplicating exemplars would be pure noise downstream.
    """
    if m < 1:
        raise ValueError("kcenter_select: m must be >= 1")
    _validate(max(m, 2), 1, scale, dim)
    id_type = df.schema[id_col].dataType.simpleString()
    q = _quantized(df, id_col, vec_col, dim, scale).withColumnRenamed(
        id_col, "id_out"
    )
    if persist:
        q = q.persist()
    try:
        row0 = (
            q.select(
                "id_out",
                "__qv",
                F.md5(
                    F.concat(
                        F.col("id_out").cast("string"), F.lit(f"|{seed}")
                    )
                ).alias("__h"),
            )
            .orderBy("__h", "id_out")
            .limit(1)
            .collect()
        )
        if not row0:
            raise ValueError(
                "kcenter_select: no usable vectors in the corpus"
            )
        ids = [row0[0]["id_out"]]
        centers = np.asarray([row0[0]["__qv"]], dtype=np.int64)
        radii: list[int] = []
        for _ in range(1, m):
            kernel, schema = _assign_kernel(
                centers, id_type, with_vec=True, with_dist=True
            )
            far = (
                q.mapInPandas(kernel, schema)
                .orderBy(F.desc("dist2"), F.asc("id_out"))
                .limit(1)
                .collect()
            )
            if not far or far[0]["dist2"] == 0:
                break  # corpus exhausted: every point is a duplicate
            ids.append(far[0]["id_out"])
            radii.append(int(far[0]["dist2"]))
            centers = np.vstack(
                [centers, np.asarray(far[0]["qv"], dtype=np.int64)]
            )
    finally:
        if persist:
            q.unpersist()
    return KCenterResult(
        ids=tuple(ids),
        centers=centers,
        radii=tuple(radii),
        scale=scale,
        seed=seed,
    )


def save_kmeans_model(spark, model: KMeansModel, table: str) -> None:
    """Persist the model as a k-row table ``(cluster, center, scale,
    n_iter, seed)`` — train once, assign daily: the production
    continuity every persistent index here has (IVF centroids, PQ
    codebooks).  One job-atomic overwrite."""
    rows = [
        (int(c), [int(v) for v in model.centers[c]],
         int(model.scale), int(model.n_iter), int(model.seed))
        for c in range(model.k)
    ]
    spark.createDataFrame(
        rows,
        "cluster int, center array<long>, scale long, n_iter int, "
        "seed long",
    ).write.mode("overwrite").saveAsTable(table)


def load_kmeans_model(spark, table: str) -> KMeansModel:
    """Rehydrate a :func:`save_kmeans_model` table (k×dim bounded
    driver state, ordered by cluster id)."""
    rows = sorted(
        spark.table(table).collect(), key=lambda r: r["cluster"]
    )
    if not rows:
        raise ValueError(f"load_kmeans_model: {table} is empty")
    if [r["cluster"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"load_kmeans_model: {table} cluster ids are not 0..k-1 — "
            "not a save_kmeans_model table"
        )
    centers = np.asarray([r["center"] for r in rows], dtype=np.int64)
    return KMeansModel(
        centers=centers,
        scale=int(rows[0]["scale"]),
        n_iter=int(rows[0]["n_iter"]),
        seed=int(rows[0]["seed"]),
    )


__all__ = [
    "KMeansModel",
    "KCenterResult",
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_cluster_profile",
    "kcenter_select",
    "save_kmeans_model",
    "load_kmeans_model",
]
