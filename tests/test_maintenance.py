"""compact_dataset / dataset_stats: file-count reduction, data
equality, hive-layout preservation, in-place swap safety, no-op path."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.sources.maintenance import (
    compact_dataset,
    dataset_stats,
)


def _fragmented(spark, path, n_files=24, partitioned=False):
    df = spark.range(3000).select(
        F.col("id"),
        (F.col("id") % 3).alias("grp"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    w = df.repartition(n_files).write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("grp")
    w.parquet(path)
    return df


def test_stats_counts_data_files_only(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        _fragmented(spark, path, n_files=10)
        s = dataset_stats(spark, path)
        assert s["n_files"] == 10
        assert s["total_bytes"] > 0
        assert s["min_bytes"] <= s["avg_bytes"] <= s["max_bytes"]


def test_inplace_compaction_reduces_files_keeps_rows(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        df = _fragmented(spark, path, n_files=24)
        expected = sorted(
            (r["id"], r["payload"]) for r in df.collect()
        )
        out = compact_dataset(spark, path, target_file_mb=64)
        assert out["compacted"] is True
        assert out["after"]["n_files"] < out["before"]["n_files"]
        assert out["after"]["n_files"] == 1  # tiny dataset → one file
        back = sorted(
            (r["id"], r["payload"])
            for r in spark.read.parquet(path).collect()
        )
        assert back == expected
        # no leftover temp siblings
        assert os.listdir(d) == ["t"]


def test_partitioned_layout_preserved(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        df = _fragmented(spark, path, n_files=16, partitioned=True)
        out = compact_dataset(
            spark, path, partition_by=["grp"], target_file_mb=64
        )
        assert out["compacted"] is True
        dirs = sorted(
            e for e in os.listdir(path) if e.startswith("grp=")
        )
        assert dirs == ["grp=0", "grp=1", "grp=2"]
        # one writer per partition on a tiny dataset → one file each
        for sub in dirs:
            files = [
                f
                for f in os.listdir(os.path.join(path, sub))
                if not f.startswith(("_", "."))
            ]
            assert len(files) == 1
        back = spark.read.parquet(path)
        assert back.count() == df.count()
        assert set(back.columns) == set(df.columns)


def test_dest_mode_leaves_source_untouched(spark):
    with tempfile.TemporaryDirectory() as d:
        src, dst = os.path.join(d, "src"), os.path.join(d, "dst")
        _fragmented(spark, src, n_files=8)
        before = dataset_stats(spark, src)
        out = compact_dataset(spark, src, dest=dst, target_file_mb=64)
        assert out["compacted"] and out["path"] == dst
        assert dataset_stats(spark, src) == before
        assert (
            spark.read.parquet(dst).count()
            == spark.read.parquet(src).count()
        )


def test_noop_below_min_files(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        _fragmented(spark, path, n_files=1)
        out = compact_dataset(spark, path)
        assert out["compacted"] is False
        assert dataset_stats(spark, path)["n_files"] == 1


def test_target_size_splits_output(spark):
    """A target below the data size must produce multiple ~target-sized
    files, not one giant file."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        big = spark.range(60_000).select(
            F.col("id"),
            F.sha2(F.col("id").cast("string"), 512).alias("payload"),
        )
        big.repartition(12).write.parquet(path)
        total = dataset_stats(spark, path)["total_bytes"]
        assert total > 2 * (1 << 20)  # sanity: >2 MB so 1 MB target splits
        out = compact_dataset(spark, path, target_file_mb=1)
        assert out["compacted"] is True
        after = out["after"]
        assert 1 < after["n_files"] < 12
        # files are near target, not runt-sized
        assert after["max_bytes"] < 2 * (1 << 20)


def test_validation(spark):
    with pytest.raises(ValueError):
        compact_dataset(spark, "/nonexistent", target_file_mb=0)
