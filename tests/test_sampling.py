"""Deterministic splitting/sampling: stability, exhaustiveness,
proportions, and near-dup leakage safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.sampling import (
    component_split,
    hash_split,
    stratified_sample,
)

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_hash_split_deterministic_and_exhaustive(spark):
    df = spark.range(20_000).withColumn("doc", F.concat(F.lit("d"), F.col("id")))
    a = hash_split(df, ["doc"], FRACS)
    b = hash_split(df.repartition(13), ["doc"], FRACS)  # different layout
    ma = {r["doc"]: r["split"] for r in a.collect()}
    mb = {r["doc"]: r["split"] for r in b.collect()}
    assert ma == mb  # pure function of (key, seed)
    assert set(ma.values()) == {"train", "val", "test"}
    n = len(ma)
    counts = {s: sum(1 for v in ma.values() if v == s) for s in FRACS}
    for name, frac in FRACS.items():
        assert abs(counts[name] / n - frac) < 0.02, (name, counts)


def test_hash_split_rejects_bad_fractions(spark):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(spark.range(5), ["id"], {"a": 0.5, "b": 0.2})


def test_hash_split_stable_across_snapshots(spark):
    # incremental reprocessing: a row present in two different corpus
    # snapshots must keep its assignment
    full = hash_split(spark.range(10_000), ["id"], FRACS)
    subset = hash_split(spark.range(0, 10_000, 7), ["id"], FRACS)
    mf = {r["id"]: r["split"] for r in full.collect()}
    for r in subset.collect():
        assert mf[r["id"]] == r["split"]


def test_component_split_keeps_near_dups_together(spark):
    # pairs chain 0-1-2 and 10-11; everything else is a singleton
    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = component_split(
        docs, pairs, id_col="doc_id", fractions=FRACS
    )
    m = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(m) == 100  # no row lost or duplicated by the join
    assert m[0] == m[1] == m[2]  # transitive cluster moves as one
    assert m[10] == m[11]
    # and the assignment is still deterministic under re-run
    m2 = {
        r["doc_id"]: r["split"]
        for r in component_split(
            docs.repartition(7), pairs, id_col="doc_id", fractions=FRACS
        ).collect()
    }
    assert m == m2


def test_stratified_sample_deterministic_and_rate(spark):
    df = spark.range(30_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    s = stratified_sample(df, ["lang"], {"0": 0.5, "1": 0.1, "2": 0.0},
                          key_cols=["id"])
    got = s.groupBy("lang").count().collect()
    rates = {r["lang"]: r["count"] / 10_000 for r in got}
    assert abs(rates.get("0", 0) - 0.5) < 0.03
    assert abs(rates.get("1", 0) - 0.1) < 0.03
    assert "2" not in rates
    # determinism: same rows kept on re-run over a different layout
    ids1 = {r["id"] for r in s.collect()}
    ids2 = {
        r["id"]
        for r in stratified_sample(
            df.repartition(11), ["lang"], {"0": 0.5, "1": 0.1, "2": 0.0},
            key_cols=["id"],
        ).collect()
    }
    assert ids1 == ids2


def test_pack_greedy_bounds_and_determinism(spark):
    from data_toolz_spark.operators.sampling import pack_greedy

    df = spark.range(5_000).select(
        F.col("id"), (F.col("id") % 90 + 10).alias("n_tok")
    )
    budget, max_tok = 512, 99
    packed = pack_greedy(
        df, id_col="id", token_col="n_tok", budget=budget, n_shards=8
    )
    rows = packed.collect()
    assert len(rows) == 5_000  # every doc exactly once
    totals = {}
    for r in rows:
        key = (r["pack_bin"]["shard"], r["pack_bin"]["bin"])
        totals[key] = totals.get(key, 0) + r["n_tok"]
    # overhang bound: total < budget + max doc size
    assert all(t < budget + max_tok for t in totals.values()), max(
        totals.values()
    )
    # bins are well-filled: all but each shard's last bin reach budget
    # minus one doc's overhang
    last_bins = {}
    for s, b in totals:
        last_bins[s] = max(last_bins.get(s, -1), b)
    for (s, b), t in totals.items():
        if b < last_bins[s]:
            assert t >= budget - max_tok, (s, b, t)
    # deterministic under different physical layout
    again = {
        r["id"]: (r["pack_bin"]["shard"], r["pack_bin"]["bin"])
        for r in pack_greedy(
            df.repartition(17), id_col="id", token_col="n_tok",
            budget=budget, n_shards=8,
        ).collect()
    }
    first = {r["id"]: (r["pack_bin"]["shard"], r["pack_bin"]["bin"]) for r in rows}
    assert first == again


def test_split_is_codegen_only(spark):
    # no shuffle, no Python: the split must be a project over the scan
    df = hash_split(spark.range(1000), ["id"], FRACS)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_stratified_sample_requires_row_identifying_key(spark):
    """ADVICE r4 (high): a stratum-constant key makes u constant per
    stratum, so `u < rate` keeps or drops whole strata — raise instead."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    with pytest.raises(ValueError, match="key_cols is required"):
        stratified_sample(df, ["lang"], 0.5)
    with pytest.raises(ValueError, match="outside strata_cols"):
        stratified_sample(df, ["lang"], 0.5, key_cols=["lang"])
    with pytest.raises(ValueError, match="outside strata_cols"):
        stratified_sample(
            df, ["lang"], {"0": 0.5, "1": 0.1, "2": 0.0}, key_cols=["lang"]
        )
    # degenerate rates are per-stratum-constant anyway: still allowed
    kept = stratified_sample(
        df, ["lang"], {"0": 1.0, "1": 0.0, "2": 0.0}, key_cols=["lang"]
    )
    assert {r["lang"] for r in kept.collect()} == {"0"}


def test_component_split_rejects_non_numeric_string_ids(spark):
    """ADVICE r4: a non-numeric id silently cast to NULL used to funnel
    every unpaired row into one split — now it raises per-row."""
    docs = spark.range(20).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id")
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    out = component_split(docs, pairs, id_col="doc_id", fractions=FRACS)
    with pytest.raises(Exception, match="not castable"):
        out.collect()
    # numeric strings still cast cleanly and route like longs
    docs2 = spark.range(20).select(F.col("id").cast("string").alias("doc_id"))
    m = {
        r["doc_id"]: r["split"]
        for r in component_split(
            docs2, pairs, id_col="doc_id", fractions=FRACS
        ).collect()
    }
    assert len(m) == 20
    assert m["0"] == m["1"]  # the pair still routes together


def test_mixture_rates_math():
    from data_toolz_spark.operators.sampling import mixture_rates

    counts = {"a": 800, "b": 100, "c": 100}
    # T=1: natural proportions -> every rate equals target/total
    r1 = mixture_rates(counts, target_rows=500, temperature=1.0)
    assert all(abs(v - 0.5) < 1e-12 for v in r1.values())
    # T->inf limit: uniform mixture -> small sources need upsampling
    r = mixture_rates(counts, target_rows=600, temperature=1e9)
    assert abs(r["a"] - 200 / 800) < 1e-6
    assert abs(r["b"] - 200 / 100) < 1e-6  # rate 2.0: must repeat
    # expected totals always hit target_rows exactly
    for t in (0.5, 1.0, 3.0):
        rr = mixture_rates(counts, target_rows=600, temperature=t)
        assert abs(sum(rr[s] * counts[s] for s in counts) - 600) < 1e-6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_rates(counts, target_rows=10, temperature=0.0)


def test_mixture_sample_downsample_deterministic(spark):
    from data_toolz_spark.operators.sampling import (
        mixture_rates,
        mixture_sample,
    )

    df = spark.range(2000).selectExpr(
        "id", "CASE WHEN id % 10 < 8 THEN 'web' ELSE 'books' END AS source"
    )
    out1 = mixture_sample(
        df, "source", target_rows=1000, temperature=2.0, key_cols=["id"]
    )
    got1 = sorted(r["id"] for r in out1.collect())
    got2 = sorted(r["id"] for r in mixture_sample(
        df, "source", target_rows=1000, temperature=2.0, key_cols=["id"]
    ).collect())
    assert got1 == got2  # deterministic per key
    # realized per-source counts within binomial noise of expectation
    rates = mixture_rates(
        {"web": 1600, "books": 400}, target_rows=1000, temperature=2.0
    )
    by_src = {
        r["source"]: r["n"]
        for r in out1.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, n_s in (("web", 1600), ("books", 400)):
        exp = min(rates[s], 1.0) * n_s
        sd = (n_s * min(rates[s], 1.0) * (1 - min(rates[s], 1.0))) ** 0.5
        assert abs(by_src.get(s, 0) - exp) <= 5 * sd + 1, (s, by_src, exp)


def test_mixture_sample_upsample_repeats_tagged(spark):
    from data_toolz_spark.operators.sampling import mixture_sample

    df = spark.range(1000).selectExpr(
        "id", "CASE WHEN id < 900 THEN 'big' ELSE 'rare' END AS source"
    )
    out = mixture_sample(
        df, "source", target_rows=1000, temperature=1e9,
        key_cols=["id"], allow_upsample=True,
    ).collect()
    rare = [r for r in out if r["source"] == "rare"]
    # uniform mixture: rare should contribute ~500 rows from 100 docs
    # (rate 5.0) - every doc appears >= 5 times... rate exactly 5.0:
    # floor=5, frac=0 -> exactly 5 copies each, tagged 0..4
    from collections import Counter

    per_doc = Counter(r["id"] for r in rare)
    assert set(per_doc.values()) == {5}
    copies = sorted(r["mix_copy"] for r in rare if r["id"] == rare[0]["id"])
    assert copies == [0, 1, 2, 3, 4]
    big = [r for r in out if r["source"] == "big"]
    # big side downsampled toward 500: every kept row exactly once
    assert all(r["mix_copy"] == 0 for r in big)
    assert abs(len(big) - 500) <= 5 * (900 * (5 / 9) * (4 / 9)) ** 0.5


def test_mixture_sample_requires_keys(spark):
    from data_toolz_spark.operators.sampling import mixture_sample

    df = spark.range(10).selectExpr("id", "'x' AS source")
    with pytest.raises(ValueError, match="key_cols"):
        mixture_sample(df, "source", target_rows=5, key_cols=[])
