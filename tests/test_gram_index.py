"""Incremental exact-substring dedup: the persistent gram index
(operators/incremental.py X94) + its streaming ingest twin.

The load-bearing claim is EQUIVALENCE: with min_docs=2 and history
ids preceding increment ids, build-on-A + incremental-on-B must
reproduce the batch operator run over A∪B row for row — the
incremental path is a factoring of the same computation, not a new
semantics."""

from __future__ import annotations

import pytest

from data_toolz_spark.operators.incremental import (
    append_to_gram_index,
    build_gram_index,
    dedup_spans_incremental,
)
from data_toolz_spark.operators.text_analysis import (
    remove_duplicate_spans,
)

PASSAGE = "one two three four five"
BOILER = "lorem ipsum dolor sit amet"


@pytest.fixture()
def history(spark):
    # no duplicate spans WITHIN the history (its as-written state)
    rows = [
        (1, f"intro words here {PASSAGE} closing remarks now"),
        (2, "completely different content with no shared spans"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _inc(spark):
    return spark.createDataFrame(
        [
            # repeats the historical passage → cut (keeper is doc 1)
            (10, f"fresh text {PASSAGE} and a new tail"),
            # boilerplate shared within the increment → 11 keeps
            (11, f"first copy {BOILER} unique suffix eleven"),
            (12, f"second copy {BOILER} unique suffix twelve"),
            # novel + too short for any gram
            (13, "tiny doc"),
        ],
        "doc_id long, text string",
    )


def test_incremental_equals_batch_over_union(spark, history, tmp_path):
    table = "gram_idx_eq"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_gram_index(
        history, table, n=3, n_buckets=4, path=str(tmp_path / "gi")
    )
    inc = _inc(spark)
    got = {
        r["doc_id"]: (r["text"], r["n_dropped_words"])
        for r in dedup_spans_incremental(
            spark, inc, table, n=3, min_docs=2
        ).collect()
    }
    want = {
        r["doc_id"]: (r["text"], r["n_dropped_words"])
        for r in remove_duplicate_spans(
            history.unionByName(inc), n=3, min_docs=2
        ).collect()
        if r["doc_id"] >= 10
    }
    assert got == want
    # sanity on the semantics themselves, not just the equivalence
    assert PASSAGE not in got[10][0] and "fresh text" in got[10][0]
    assert BOILER in got[11][0]  # increment keeper
    assert BOILER not in got[12][0]
    assert got[13] == ("tiny doc", 0)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_append_then_second_increment_and_uniqueness(
    spark, history, tmp_path
):
    table = "gram_idx_app"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_gram_index(
        history, table, n=3, n_buckets=4, path=str(tmp_path / "gi")
    )
    cleaned = dedup_spans_incremental(
        spark, _inc(spark), table, n=3, min_docs=2
    )
    append_to_gram_index(cleaned, table, n=3)
    # one row per distinct gram even after the fold
    total = spark.table(table).count()
    assert (
        spark.table(table).select("gram").distinct().count() == total
    )
    # a later increment resending the increment-1 boilerplate (whose
    # canonical copy doc 11 now owns) gets it cut
    # context words differ from doc 11's, so only the boilerplate's
    # interior trigrams hit the index and the context survives (a
    # shared CONTEXT word would legitimately widen the cut: the
    # boundary trigram would itself be corpus-owned)
    inc2 = spark.createDataFrame(
        [(20, f"late resend {BOILER} twenty tail")],
        "doc_id long, text string",
    )
    out = dedup_spans_incremental(
        spark, inc2, table, n=3, min_docs=2
    ).collect()[0]
    assert BOILER not in out["text"]
    assert out["text"] == "late resend twenty tail"
    # replaying the same fold is a no-op (anti-join idempotence)
    append_to_gram_index(cleaned, table, n=3)
    assert spark.table(table).count() == total
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_span_ingest_across_cycles(spark, tmp_path):
    from data_toolz_spark.streaming.ingest import run_span_dedup_ingest

    src = str(tmp_path / "src")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    table = "gram_idx_stream"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_gram_index(
        empty, table, n=3, n_buckets=4, path=str(tmp_path / "gi")
    )

    spark.createDataFrame(
        [(1, f"cycle one holds {PASSAGE} as canonical")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(src)
    run_span_dedup_ingest(
        stream,
        index_table=table,
        output_path=out,
        checkpoint_dir=ckpt,
        n=3,
        min_docs=2,
    )
    got1 = {
        r["doc_id"]: r for r in spark.read.parquet(out).collect()
    }
    assert PASSAGE in got1[1]["text"]
    assert got1[1]["n_dropped_words"] == 0

    spark.createDataFrame(
        [(10, f"cycle two resends {PASSAGE} verbatim")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(src)
    run_span_dedup_ingest(
        stream2,
        index_table=table,
        output_path=out,
        checkpoint_dir=ckpt,
        n=3,
        min_docs=2,
    )
    got2 = {
        r["doc_id"]: r for r in spark.read.parquet(out).collect()
    }
    assert PASSAGE in got2[1]["text"]  # canonical copy untouched
    assert PASSAGE not in got2[10]["text"]
    assert got2[10]["n_dropped_words"] > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_index_side_joins_without_exchange(spark, history, tmp_path):
    """The scale property (the fingerprint-catalog argument): the
    bucketed gram index is read in place — no Exchange above its scan
    in the history-hit join; only the increment's grams shuffle."""
    table = "gram_idx_plan"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_gram_index(
        history, table, n=3, n_buckets=4, path=str(tmp_path / "gidx")
    )
    inc = _inc(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            dedup_spans_incremental(spark, inc, table, n=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    lines = plan.splitlines()
    idx_scan = [
        i
        for i, l in enumerate(lines)
        if "FileScan" in l and "gidx" in l.lower()
    ]
    assert idx_scan, plan
    for i in idx_scan:
        above = "\n".join(lines[max(0, i - 4): i])
        assert "Exchange" not in above, above
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_validation(spark, history):
    with pytest.raises(ValueError):
        dedup_spans_incremental(spark, history, "x", n=1)
    with pytest.raises(ValueError):
        dedup_spans_incremental(spark, history, "x", min_docs=1)
