"""export_training_shards: deterministic hash-ordered shards, manifest
invariance under repartitioning, cluster-coherent routing, budget
bounds, and the ordered hive write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.sampling import export_training_shards


def _docs(spark, n=200, parts=None):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(90)) + 10).alias("n_tokens"),
    )
    return df.repartition(parts) if parts else df


def _manifest_key(m):
    return {
        (r["shard"], r["pack_bin"]): (
            r["n_docs"],
            r["total_tokens"],
            tuple(r["doc_ids"]),
            r["ids_md5"],
        )
        for r in m.collect()
    }


def test_manifest_invariant_under_repartitioning(spark):
    a = export_training_shards(
        _docs(spark, parts=1), id_col="doc_id", token_col="n_tokens",
        budget=256, n_shards=8,
    )
    b = export_training_shards(
        _docs(spark, parts=17), id_col="doc_id", token_col="n_tokens",
        budget=256, n_shards=8,
    )
    ka, kb = _manifest_key(a), _manifest_key(b)
    assert ka == kb
    assert sum(v[0] for v in ka.values()) == 200  # every doc, exactly once
    ids = [i for v in ka.values() for i in v[2]]
    assert len(set(ids)) == 200


def test_bin_budget_bound(spark):
    m = export_training_shards(
        _docs(spark), id_col="doc_id", token_col="n_tokens",
        budget=256, n_shards=4,
    )
    # overhang bounded by the largest doc (tokens <= 99 here)
    assert all(
        r["total_tokens"] < 256 + 99 for r in m.collect()
    )


def test_components_keep_clusters_in_one_shard(spark):
    docs = _docs(spark, n=120)
    # clusters of 4 consecutive ids, component = min member
    comp = spark.range(120).select(
        F.col("id"), (F.col("id") - F.col("id") % 4).alias("component")
    )
    m = export_training_shards(
        docs, id_col="doc_id", token_col="n_tokens", budget=512,
        n_shards=8, components=comp,
    )
    shard_of = {}
    for r in m.collect():
        for i in r["doc_ids"]:
            shard_of[i] = r["shard"]
    for i in range(120):
        assert shard_of[i] == shard_of[i - i % 4]  # no cluster straddles


def test_ordered_hive_write_matches_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    m = export_training_shards(
        _docs(spark, n=80), id_col="doc_id", token_col="n_tokens",
        budget=512, n_shards=4, path=out,
    )
    back = spark.read.parquet(out)
    assert back.count() == 80
    # per shard, file order == position order == manifest id order
    for s in range(4):
        rows = (
            back.filter(F.col("shard") == s)
            .select("doc_id", "position", "pack_bin")
            .collect()
        )
        by_pos = [r["doc_id"] for r in sorted(rows, key=lambda r: r["position"])]
        want = [
            i
            for r in sorted(
                (r for r in m.collect() if r["shard"] == s),
                key=lambda r: r["pack_bin"],
            )
            for i in r["doc_ids"]
        ]
        assert by_pos == want


def test_manifest_table_persists(spark):
    from data_toolz_spark.catalog import drop_stale_table

    table = "dtz_test_shard_manifest"
    drop_stale_table(spark, table)
    m = export_training_shards(
        _docs(spark, n=60), id_col="doc_id", token_col="n_tokens",
        budget=512, n_shards=4, manifest_table=table,
    )
    assert _manifest_key(spark.table(table)) == _manifest_key(m)
    drop_stale_table(spark, table)


def test_validation(spark):
    with pytest.raises(ValueError, match="budget"):
        export_training_shards(
            _docs(spark), id_col="doc_id", token_col="n_tokens", budget=0
        )
    with pytest.raises(ValueError, match="n_shards"):
        export_training_shards(
            _docs(spark), id_col="doc_id", token_col="n_tokens",
            budget=10, n_shards=0,
        )
