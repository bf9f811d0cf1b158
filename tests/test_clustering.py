"""Integer-exact distributed k-means: differential vs a pure-numpy
reference, repartition invariance (the determinism contract), empty
clusters, assignment semantics, input hygiene, validation."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.clustering import (
    KMeansModel,
    kmeans_assign,
    kmeans_cluster_profile,
    kmeans_fit,
)


def _ref_fit(ids, vecs, *, k, n_iter, seed, scale):
    """Pure-numpy twin of kmeans_fit (same quantization, same md5
    init, same floor-div update, same first-min tie-break)."""
    q = np.floor(np.asarray(vecs, dtype=np.float64) * scale).astype(
        np.int64
    )
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(f"{ids[i]}|{seed}".encode()).hexdigest(),
            ids[i],
        ),
    )
    centers = q[order[:k]].copy()
    for _ in range(n_iter):
        d2 = ((q[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(axis=1)
        new = centers.copy()
        for j in range(k):
            mask = assign == j
            if mask.any():
                new[j] = np.floor_divide(q[mask].sum(0), mask.sum())
        centers = new
    d2 = ((q[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(axis=1)
    dist = d2[np.arange(len(ids)), assign]
    return centers, dict(zip(ids, zip(assign.tolist(), dist.tolist())))


def _frame(spark, ids, vecs):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>",
    )


def test_fit_and_assign_match_numpy_reference(spark):
    rng = np.random.default_rng(7)
    n, dim, k = 120, 6, 4
    vecs = rng.normal(size=(n, dim))
    ids = list(range(n))
    df = _frame(spark, ids, vecs)
    model = kmeans_fit(
        df, dim=dim, k=k, n_iter=3, seed=11, scale=1024, persist=False
    )
    ref_centers, ref_assign = _ref_fit(
        ids, vecs, k=k, n_iter=3, seed=11, scale=1024
    )
    assert np.array_equal(model.centers, ref_centers)
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_assign(
            df, model, dist_col="d2"
        ).collect()
    }
    assert got == ref_assign


def test_repartition_invariance(spark):
    """The determinism contract: integer sums are associative, so ANY
    physical layout yields bit-identical centers."""
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(90, 5))
    df = _frame(spark, range(90), vecs)
    models = [
        kmeans_fit(
            d, dim=5, k=3, n_iter=4, seed=1, scale=512, persist=False
        )
        for d in (df.repartition(1), df.repartition(7), df.repartition(32))
    ]
    assert np.array_equal(models[0].centers, models[1].centers)
    assert np.array_equal(models[0].centers, models[2].centers)


def test_empty_clusters_keep_previous_center(spark):
    """Two distinct points, k=3: at least one cluster is empty every
    round and must retain its (seed) center — k stays fixed."""
    vecs = [[0.0, 0.0]] * 6 + [[10.0, 10.0]] * 6
    df = _frame(spark, range(12), vecs)
    model = kmeans_fit(
        df, dim=2, k=3, n_iter=2, seed=5, scale=10, persist=False
    )
    assert model.centers.shape == (3, 2)
    # live clusters converge to the two point masses
    centers = {tuple(c) for c in model.centers.tolist()}
    assert (0, 0) in centers and (100, 100) in centers


def test_input_hygiene_excludes_bad_vectors(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, None),
            (3, [1.0]),  # wrong length
            (4, [float("nan"), 1.0]),
            (5, [float("inf"), 1.0]),
            (6, [3.0, 4.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    model = kmeans_fit(
        df, dim=2, k=2, n_iter=1, seed=1, scale=8, persist=False
    )
    assigned = kmeans_assign(df, model)
    assert {r["vec_id"] for r in assigned.collect()} == {1, 6}


def test_cluster_profile(spark):
    vecs = [[0.0]] * 4 + [[8.0]] * 2
    df = _frame(spark, range(6), vecs)
    model = kmeans_fit(
        df, dim=1, k=2, n_iter=2, seed=2, scale=4, persist=False
    )
    prof = kmeans_cluster_profile(
        kmeans_assign(df, model, dist_col="dist2")
    )
    rows = {r["cluster"]: (r["n_members"], r["inertia"]) for r in
            prof.collect()}
    assert sum(n for n, _ in rows.values()) == 6
    assert all(i == 0 for _, i in rows.values())  # exact point masses


def test_validation():
    with pytest.raises(ValueError, match="k must"):
        kmeans_fit(None, dim=4, k=1)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_fit(None, dim=4, k=2, n_iter=0)
    with pytest.raises(ValueError, match="scale"):
        kmeans_fit(None, dim=4, k=2, scale=0)


def test_needs_k_vectors(spark):
    df = _frame(spark, range(2), [[0.0], [1.0]])
    with pytest.raises(ValueError, match="at least k"):
        kmeans_fit(df, dim=1, k=3, n_iter=1, persist=False)


def test_model_shape_properties():
    m = KMeansModel(
        centers=np.zeros((4, 7), dtype=np.int64),
        scale=1024,
        n_iter=3,
        seed=42,
    )
    assert m.k == 4 and m.dim == 7


def test_model_save_load_roundtrip(spark):
    from data_toolz_spark.catalog import drop_stale_table
    from data_toolz_spark.operators.clustering import (
        load_kmeans_model,
        save_kmeans_model,
    )

    rng = np.random.default_rng(1)
    df = _frame(spark, range(40), rng.normal(size=(40, 3)))
    model = kmeans_fit(df, dim=3, k=2, n_iter=2, persist=False)
    table = "t_kmeans_model"
    drop_stale_table(spark, table)
    save_kmeans_model(spark, model, table)
    back = load_kmeans_model(spark, table)
    assert np.array_equal(back.centers, model.centers)
    assert (back.scale, back.n_iter, back.seed) == (
        model.scale, model.n_iter, model.seed
    )
    # assignments through the rehydrated model are identical
    a = {r["vec_id"]: r["cluster"]
         for r in kmeans_assign(df, model).collect()}
    b = {r["vec_id"]: r["cluster"]
         for r in kmeans_assign(df, back).collect()}
    assert a == b
    with pytest.raises(ValueError, match="empty"):
        drop_stale_table(spark, "t_kmeans_model_missing")
        spark.createDataFrame(
            [], "cluster int, center array<long>, scale long, "
            "n_iter int, seed long"
        ).write.mode("overwrite").saveAsTable("t_kmeans_model_missing")
        load_kmeans_model(spark, "t_kmeans_model_missing")
    drop_stale_table(spark, table)
    drop_stale_table(spark, "t_kmeans_model_missing")


# ---------------------------------------------------------------------------
# kcenter_select (r10: greedy farthest-point coreset selection)
# ---------------------------------------------------------------------------


def _ref_kcenter(ids, vecs, *, m, seed, scale):
    """Pure-Python twin: md5-min start, then m-1 rounds of argmax over
    min-dist-to-selected (ties → smallest id), early stop at d2=0."""
    q = np.floor(np.asarray(vecs, dtype=np.float64) * scale).astype(
        np.int64
    )
    start = min(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(f"{ids[i]}|{seed}".encode()).hexdigest(),
            ids[i],
        ),
    )
    sel = [start]
    radii = []
    for _ in range(1, m):
        mind2 = (
            ((q[:, None, :] - q[sel][None, :, :]) ** 2).sum(-1).min(1)
        )
        far = min(
            range(len(ids)), key=lambda i: (-int(mind2[i]), ids[i])
        )
        if mind2[far] == 0:
            break
        sel.append(far)
        radii.append(int(mind2[far]))
    return [ids[i] for i in sel], radii


def test_kcenter_matches_python_twin(spark):
    from data_toolz_spark.operators.clustering import kcenter_select

    rng = np.random.default_rng(5)
    n, dim, m = 90, 5, 7
    vecs = rng.normal(size=(n, dim)) * 3
    ids = list(range(n))
    df = _frame(spark, ids, vecs)
    res = kcenter_select(
        df, dim=dim, m=m, seed=13, scale=1024, persist=False
    )
    want_ids, want_radii = _ref_kcenter(
        ids, vecs, m=m, seed=13, scale=1024
    )
    assert list(res.ids) == want_ids
    assert list(res.radii) == want_radii
    # radii are non-increasing — the greedy coverage guarantee
    assert all(
        a >= b for a, b in zip(res.radii, res.radii[1:])
    ), res.radii


def test_kcenter_repartition_invariance(spark):
    from data_toolz_spark.operators.clustering import kcenter_select

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(60, 4))
    df = _frame(spark, list(range(60)), vecs)
    a = kcenter_select(
        df, dim=4, m=5, seed=3, scale=1024, persist=False
    )
    b = kcenter_select(
        df.repartition(11), dim=4, m=5, seed=3, scale=1024,
        persist=False,
    )
    assert a.ids == b.ids and a.radii == b.radii
    assert np.array_equal(a.centers, b.centers)


def test_kcenter_early_stop_on_duplicates(spark):
    """Fewer distinct vectors than m → selection stops, no duplicate
    exemplars."""
    from data_toolz_spark.operators.clustering import kcenter_select

    base = [[1.0, 0.0], [0.0, 1.0], [5.0, 5.0]]
    rows = [(i, base[i % 3]) for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    res = kcenter_select(df, dim=2, m=10, seed=1, persist=False)
    assert res.m == 3
    assert len(res.radii) == 2


def test_kcenter_assignment_via_model_view(spark):
    """as_kmeans_model: every corpus vector assigns to its nearest
    pick, and no distance exceeds the last coverage radius."""
    from data_toolz_spark.operators.clustering import kcenter_select

    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(80, 3))
    df = _frame(spark, list(range(80)), vecs)
    res = kcenter_select(
        df, dim=3, m=6, seed=21, scale=1024, persist=False
    )
    assigned = kmeans_assign(
        df, res.as_kmeans_model(), cluster_col="pick", dist_col="d2"
    )
    rows = assigned.collect()
    assert len(rows) == 80
    # the selected ids assign to themselves at distance 0
    sel = {r["vec_id"]: r for r in rows if r["vec_id"] in res.ids}
    for i, vid in enumerate(res.ids):
        assert sel[vid]["pick"] == i and sel[vid]["d2"] == 0
    # coverage: after the last pick every point is within the radius
    # the NEXT pick would have had — i.e. max d2 <= last recorded
    # radius is not guaranteed, but max d2 must equal the d2 of the
    # point the (m+1)-th round would pick; check the weaker monotone
    # bound: max d2 <= radii[-1]
    assert max(r["d2"] for r in rows) <= res.radii[-1]


def test_kcenter_oracle_sql_mirrors_early_stop(spark):
    """r11 (advice): on a corpus with fewer distinct vectors than m
    the DuckDB oracle must stop adding picks exactly where
    kcenter_select does (md2 > 0 guard) — no duplicate exemplar at
    distance 0."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _kmeans_oracle_sql
    from data_toolz_spark.operators.clustering import kcenter_select

    base = [[1.0, 0.0], [0.0, 1.0], [5.0, 5.0]]
    rows = [(i, base[i % 3]) for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    res = kcenter_select(
        df, dim=2, m=6, seed=7, scale=1024, persist=False
    )
    assert res.m == 3  # early-stopped on the Spark side

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [r[1] for r in rows],
            }
        ),
    )
    out = con.execute(
        _kmeans_oracle_sql(2, 1, 2, 7, 1024, kc_m=6)
    ).df()
    con.close()
    picked = out[out["kc_pick"].notna()].sort_values("kc_pick")
    assert [int(v) for v in picked["vec_id"]] == list(res.ids)
    assert [int(v) for v in picked["kc_pick"]] == [0, 1, 2]
    # every row still clusters to one of the 3 real picks
    assert set(int(v) for v in out["kc_cluster"]) <= {0, 1, 2}
