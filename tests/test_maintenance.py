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


def _file_ranges(spark, path, cols):
    """Per-file (min, max) of each col, via the file-name virtual col."""
    df = spark.read.parquet(path).withColumn(
        "__f", F.input_file_name()
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    return df.groupBy("__f").agg(*aggs).collect()


def test_zorder_value_interleaving(spark):
    """The Z-value is the exact bit interleave of the bucket indices:
    for bits=2 over unit ranges, (x,y) buckets (bx1 bx0, by1 by0)
    produce z = bx1 by1 bx0 by0 — checked against a Python reference
    on the full 4x4 grid."""
    from data_toolz_spark.sources.maintenance import zorder_value

    pts = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(pts, ["x", "y"])
    ranges = {"x": (0, 4), "y": (0, 4)}
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_value(["x", "y"], ranges, bits=2).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for bit in range(2):
            z |= ((x >> bit) & 1) << (bit * 2 + 1)
            z |= ((y >> bit) & 1) << (bit * 2)
        return z

    assert got == {(x, y): ref(x, y) for x, y in pts}


def test_zorder_write_bounds_every_dimension(spark, tmp_path):
    """Z-ordered files must carry narrow min/max windows in BOTH
    clustered columns; a single-column cluster_by leaves the other
    column's per-file range at ~full width."""
    from data_toolz_spark.sources.maintenance import zorder_write

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        F.floor(F.col("id") / 200).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "z")
    zorder_write(df, zpath, ["x", "y"], bits=8, n_files=16)
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert set(back.columns) == {"x", "y", "payload"}  # __z dropped

    rows = _file_ranges(spark, zpath, ["x", "y"])
    assert len(rows) >= 8
    avg_w_x = sum(r["hi_x"] - r["lo_x"] for r in rows) / len(rows)
    avg_w_y = sum(r["hi_y"] - r["lo_y"] for r in rows) / len(rows)
    # both dims bounded well below full width (200 each)
    assert avg_w_x < 120 and avg_w_y < 120

    # contrast: single-key clustering leaves y unbounded per file
    cpath = str(tmp_path / "c")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        cpath
    )
    crows = _file_ranges(spark, cpath, ["x", "y"])
    avg_cw_y = sum(r["hi_y"] - r["lo_y"] for r in crows) / len(crows)
    assert avg_cw_y > 150  # ~full width
    assert avg_w_y < avg_cw_y / 2


def test_zorder_validation():
    from data_toolz_spark.sources.maintenance import zorder_value

    with pytest.raises(ValueError):
        zorder_value(["a"], {"a": (0, 1)})
    with pytest.raises(ValueError):
        zorder_value(["a", "b"], {}, bits=0)
    with pytest.raises(ValueError):
        zorder_value(list("abcdef"), {}, bits=12)  # 72 bits > 62


def test_schema_contract_guard(spark, tmp_path):
    from data_toolz_spark.sources.maintenance import (
        assert_append_compatible,
        schema_problems,
    )

    path = str(tmp_path / "t")
    base = spark.range(10).select(
        F.col("id"), F.lit("x").alias("tag")
    )
    base.write.parquet(path)

    # identical schema: fine
    assert_append_compatible(spark, path, base)
    # additive evolution: fine
    assert_append_compatible(
        spark, path, base.withColumn("extra", F.lit(1.0))
    )
    # missing column: reported, waivable
    dropped = base.drop("tag")
    with pytest.raises(ValueError, match="missing from"):
        assert_append_compatible(spark, path, dropped)
    assert_append_compatible(spark, path, dropped, allow_missing=True)
    # type change: never waivable
    retyped = base.withColumn("id", F.col("id").cast("int"))
    with pytest.raises(ValueError, match="changes type"):
        assert_append_compatible(
            spark, path, retyped, allow_missing=True
        )
    # empty target: trivially compatible
    assert_append_compatible(spark, str(tmp_path / "nope"), base)
    # problem list shape
    probs = schema_problems(base.schema, retyped.schema)
    assert len(probs) == 1 and "bigint" in probs[0] and "int" in probs[0]


def test_column_profile(spark, documents):
    from data_toolz_spark.sources.maintenance import column_profile

    prof = {
        r["column"]: r for r in column_profile(documents).collect()
    }
    assert set(prof) == set(documents.columns)
    n = documents.count()
    for r in prof.values():
        assert r["n_rows"] == n
    assert prof["doc_id"]["n_nulls"] == 0
    assert prof["doc_id"]["null_frac"] == 0.0
    # exact 500 distinct ids; rsd=5% tolerance
    assert abs(prof["doc_id"]["approx_distinct"] - n) <= 0.15 * n
    assert prof["doc_id"]["dtype"] == "bigint"
    assert int(prof["doc_id"]["min_val"]) == 0
    assert prof["lang"]["approx_distinct"] <= 7  # 5 langs + slack
    assert prof["text"]["min_val"] is not None  # strings orderable


def test_column_profile_nulls_and_arrays(spark):
    from data_toolz_spark.sources.maintenance import column_profile

    df = spark.createDataFrame(
        [(1, None, [1.0]), (2, "x", None), (3, None, [2.0])],
        "id long, s string, v array<double>",
    )
    prof = {r["column"]: r for r in column_profile(df).collect()}
    assert prof["s"]["n_nulls"] == 2
    assert prof["s"]["null_frac"] == round(2 / 3, 6)
    # arrays: no min/max, but null + distinct still reported
    assert prof["v"]["min_val"] is None
    assert prof["v"]["n_nulls"] == 1
    assert prof["v"]["approx_distinct"] >= 2


def test_compact_swap_marker_cleaned_up(spark):
    """The crash-recovery marker must exist only DURING the swap: after
    a successful in-place compaction no __swap_*.marker (and no
    __old_* sibling) survives next to the dataset."""
    with tempfile.TemporaryDirectory() as root:
        path = os.path.join(root, "ds")
        _fragmented(spark, path, n_files=8)
        out = compact_dataset(spark, path, target_file_mb=64)
        assert out["compacted"] is True
        leftovers = [
            n for n in os.listdir(root)
            if "__swap_" in n or "__old_" in n or "__compact_" in n
        ]
        assert leftovers == []


def test_zorder_all_null_column_raises(spark, tmp_path):
    from data_toolz_spark.sources.maintenance import zorder_write

    df = spark.range(100).select(
        F.col("id"), F.lit(None).cast("double").alias("dead")
    )
    with pytest.raises(ValueError, match="dead"):
        zorder_write(
            df, str(tmp_path / "z"), zorder_cols=["id", "dead"]
        )


def test_profile_drift_detects_defects(spark):
    from data_toolz_spark.sources.maintenance import (
        column_profile,
        profile_drift,
    )

    base_df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 500).alias("nearly_unique"),
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id"))
        .alias("sparse_nulls"),
    )
    # today's batch: nearly_unique constant-folded, sparse_nulls 30%
    # null, and a surprise extra column
    cur_df = spark.range(400).select(
        F.col("id"),
        F.lit(7).cast("bigint").alias("nearly_unique"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id"))
        .alias("sparse_nulls"),
        F.lit("x").alias("surprise"),
    )
    findings = profile_drift(
        column_profile(base_df), column_profile(cur_df)
    )
    text = "\n".join(findings)
    assert "'surprise' is new" in text
    assert "'nearly_unique' distinct density collapsed" in text
    assert "'sparse_nulls' null_frac jumped" in text
    # id stays healthy: no finding mentions it
    assert "'id'" not in text


def test_profile_drift_healthy_is_empty(spark):
    from data_toolz_spark.sources.maintenance import (
        column_profile,
        profile_drift,
    )

    a = spark.range(2000).select(
        F.col("id"), (F.col("id") % 10).alias("g")
    )
    b = spark.range(500).select(
        F.col("id"), (F.col("id") % 10).alias("g")
    )
    assert profile_drift(column_profile(a), column_profile(b)) == []


def test_profile_drift_type_change(spark):
    from data_toolz_spark.sources.maintenance import (
        column_profile,
        profile_drift,
    )

    a = spark.range(10).select(F.col("id"))
    b = spark.range(10).select(F.col("id").cast("int"))
    findings = profile_drift(column_profile(a), column_profile(b))
    assert findings == ["column 'id' changed type bigint -> int"]


# ---------------------------------------------------------------------------
# r12: corpus snapshot diff — content-level added/removed/changed
# ---------------------------------------------------------------------------


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_diff_statuses_and_summary(spark):
    from data_toolz_spark.sources.maintenance import (
        corpus_diff,
        corpus_diff_summary,
    )

    old = _snap(
        spark,
        [(1, "alpha"), (2, "bravo"), (3, "charlie"), (4, "delta")],
    )
    new = _snap(
        spark,
        [(2, "bravo"), (3, "charlie EDITED"), (4, "delta"), (5, "echo")],
    )
    diff = corpus_diff(old, new)
    got = {r["doc_id"]: r["status"] for r in diff.collect()}
    assert got == {1: "removed", 3: "changed", 5: "added"}
    # unchanged rows never appear; fingerprints carried for audit
    by_id = {r["doc_id"]: r for r in diff.collect()}
    assert by_id[1]["new_fingerprint"] is None
    assert by_id[5]["old_fingerprint"] is None
    assert (
        by_id[3]["old_fingerprint"] != by_id[3]["new_fingerprint"]
        and by_id[3]["old_fingerprint"] is not None
    )
    assert corpus_diff_summary(diff) == {
        "added": 1,
        "removed": 1,
        "changed": 1,
    }
    # identical snapshots -> empty delta
    assert corpus_diff(old, old).count() == 0


def test_corpus_diff_precomputed_fingerprint_column(spark):
    """fingerprint_col reuses an existing fingerprint (e.g. the
    catalog's) — identical delta to hashing the text."""
    from data_toolz_spark.functions.text import text_fingerprint
    from data_toolz_spark.sources.maintenance import corpus_diff

    old = _snap(spark, [(1, "alpha"), (2, "bravo")])
    new = _snap(spark, [(1, "alpha"), (2, "bravo CHANGED"), (9, "zulu")])
    pre_old = old.withColumn("fp", text_fingerprint(F.col("text")))
    pre_new = new.withColumn("fp", text_fingerprint(F.col("text")))
    want = sorted(
        map(tuple, corpus_diff(old, new).collect())
    )
    got = sorted(
        map(
            tuple,
            corpus_diff(
                pre_old, pre_new, fingerprint_col="fp"
            ).collect(),
        )
    )
    assert got == want and len(got) == 2


def test_corpus_diff_bucketed_no_shuffle(spark, tmp_path):
    """Snapshots written bucketed on the id diff with ZERO Exchange —
    the co-located-join contract transferred to dataset versioning."""
    from data_toolz_spark.sources.io import DataIO
    from data_toolz_spark.sources.maintenance import corpus_diff

    io = DataIO()
    old = _snap(
        spark, [(i, f"doc {i}") for i in range(200)]
    )
    new = _snap(
        spark,
        [(i, f"doc {i}" if i % 7 else f"doc {i} v2") for i in range(5, 205)],
    )
    io.write_bucketed(
        old, "b_snap_old", bucket_by=["doc_id"], n_buckets=4,
        sort_by=["doc_id"], path=str(tmp_path / "b_old"),
    )
    io.write_bucketed(
        new, "b_snap_new", bucket_by=["doc_id"], n_buckets=4,
        sort_by=["doc_id"], path=str(tmp_path / "b_new"),
    )
    try:
        diff = corpus_diff(
            spark.table("b_snap_old"), spark.table("b_snap_new")
        )
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = diff._sc._jvm.PythonSQLUtils.explainString(
                diff._jdf.queryExecution(), "formatted"
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        got = {r["doc_id"]: r["status"] for r in diff.collect()}
        assert got[200] == "added" and got[0] == "removed"
        assert got[7] == "changed" and 8 not in got
    finally:
        spark.sql("DROP TABLE IF EXISTS b_snap_old")
        spark.sql("DROP TABLE IF EXISTS b_snap_new")
