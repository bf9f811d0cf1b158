"""Round-2 scale paths: connected components, band/LSH blocking.

Each scale-path operator is checked against its brute-force twin on
real test data — same contract the DuckDB oracle enforces at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_toolz_spark.operators.dedup import (
    connected_components,
    near_duplicate_drop_list,
    simhash32,
    simhash_band_pairs,
    simhash_near_duplicates,
)
from data_toolz_spark.operators.similarity import (
    cosine_near_duplicates,
    cosine_near_duplicates_lsh,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _cc_map(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_connected_components_chain(spark):
    # chain 1-2-3-4 plus separate pair 10-11: two components
    cc = _cc_map(
        connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]))
    )
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_star_merge(spark):
    # (1,3),(2,3): 1 and 2 only connected THROUGH 3 — the case greedy
    # drop-id_b gets wrong (it would keep both 1 and 2)
    cc = _cc_map(connected_components(_pairs(spark, [(1, 3), (2, 3)])))
    assert cc == {1: 1, 2: 1, 3: 1}


def test_connected_components_deep_chain(spark):
    # long path exercises multiple large-star/small-star rounds
    edges = [(i, i + 1) for i in range(30)]
    cc = _cc_map(connected_components(_pairs(spark, edges)))
    assert set(cc.values()) == {0}
    assert len(cc) == 31


def test_drop_list_exact_vs_greedy(spark):
    pairs = _pairs(spark, [(1, 3), (2, 3)])
    greedy = {
        r["drop_id"]
        for r in near_duplicate_drop_list(pairs, exact=False).collect()
    }
    exact = {
        r["drop_id"]
        for r in near_duplicate_drop_list(pairs, exact=True).collect()
    }
    assert greedy == {3}  # misses 2: never appears as id_b's cluster rep
    assert exact == {2, 3}  # transitive closure keeps only min id 1


def test_simhash_band_pairs_equal_bruteforce(spark, documents):
    sample = documents.limit(120).cache()
    brute = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_duplicates(
            sample, "doc_id", "text", max_hamming=2, block_cols=["lang"]
        ).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_band_pairs(
            sample, "doc_id", "text", max_hamming=2
        ).collect()
    }
    # band blocking is EXACT (pigeonhole) and unblocked, so it must be a
    # superset of the lang-blocked brute force with identical distances
    for key, ham in brute.items():
        assert banded[key] == ham
    # and every banded pair must verify against a direct recompute
    sh = {
        r["doc_id"]: r["s"]
        for r in sample.select("doc_id", simhash32("text").alias("s")).collect()
    }
    for (ia, ib), ham in banded.items():
        assert bin(sh[ia] ^ sh[ib]).count("1") == ham <= 2


def test_simhash_band_pairs_rejects_lossy_blocks(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        simhash_band_pairs(df, "doc_id", "text", max_hamming=3, n_blocks=2)


def test_cosine_lsh_equal_bruteforce(spark, embeddings):
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_duplicates(
            embeddings.withColumn("__b", F.lit(1)),
            id_col="vec_id",
            threshold=0.4,
            block_cols=["__b"],
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_duplicates_lsh(
            embeddings,
            id_col="vec_id",
            threshold=0.4,
            dim=64,
            n_bits=4,
            n_tables=64,
        ).collect()
    }
    # verify stage makes precision exactly 1.0; OR-amplified tables give
    # recall 1.0 on this corpus (deterministic seeded hyperplanes)
    assert lsh == brute
    assert len(brute) > 0
