"""Driver-contract invariants that must survive refactors."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_registry_at_most_50_qids():
    # the driver records at most 50 correctness rows per round; a
    # larger registry can never be fully attested (VERDICT r2)
    qids = list(entrymod.queries())
    assert len(qids) <= 50, len(qids)
    assert len(qids) == len(set(qids))


def test_every_qid_has_an_oracle():
    # every registered query must be value-checkable — rows-only
    # entries were eliminated in r3 (the ANN qid gained an exact
    # oracle via its pinned recall-1.0 config)
    missing = [q for q in entrymod.queries() if q not in entrymod.oracle_sql()]
    assert missing == [], missing


def test_no_orphan_oracles():
    orphans = [q for q in entrymod.oracle_sql() if q not in entrymod.queries()]
    assert orphans == [], orphans


def test_bench_headline_resolvable():
    # the fixed 24-query headline series must keep resolving even as
    # the registry evolves (folded entries resolve via bench.LEGACY)
    import bench

    qids = entrymod.queries()
    unresolved = [
        q for q in bench.HEADLINE
        if q not in qids and q not in bench.LEGACY
    ]
    assert unresolved == [], unresolved


def test_cache_track_release(spark):
    from data_toolz_spark import cache

    df = spark.range(100).persist()
    cache.track(df)
    assert cache.release() >= 1
    assert df.storageLevel.useMemory is False  # unpersisted
    assert cache.release() == 0  # idempotent, list cleared


def test_folded_callables_still_run(spark):
    # every qid folded out of the 50-slot registry keeps a working
    # callable (bench series continuity + judge parity audits); this
    # pins them against silent rot
    import __spark_entry__ as entrymod

    folded = [
        entrymod.proj_drop_columns,       # r5 → scan_parquet et al.
        entrymod.scan_parquet,            # r5 → every load()-based qid
        entrymod.agg_partition_rowcounts,  # r5 → q1 count_order per group
        entrymod.win_ntile_quartiles,     # r5 → win_ordered_analytics
        entrymod.text_quality_q,          # r5 → text_web_signals
        entrymod.part_distinct,           # r3 → agg_partition_rowcounts
        entrymod.q4_order_priority,       # r5 → join_semi_parts + q18
        entrymod.text_token_stats_q,      # r6 → web_signals + vocab_topk
        entrymod.emb_dimension_stats,     # r6 → similarity unit-vector path
        entrymod.json_key_histogram,      # r6 → filter_exists/nested_and
        entrymod.set_ops_users,           # r6 → join_semi/anti
        entrymod.dedup_minhash_q,         # r6 → cc_drop + incremental_minhash_pairs
        entrymod.topk_per_group,          # r6 → text_tfidf_topk window
        entrymod.scan_dsv_roundtrip,      # r7 → scan_text_roundtrips
        entrymod.scan_jsonlines_roundtrip,  # r7 → scan_text_roundtrips
    ]
    for fn in folded:
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, fn.__name__
        assert df.limit(1).count() >= 0, fn.__name__


def test_defn_pins_resolve_and_analyze(spark):
    # every sweep-time definition pin must (a) shadow a REGISTERED
    # qid and (b) build a DataFrame that passes analysis — the r9
    # text_bpe_tokens pin initially referenced a column the pre-fold
    # path doesn't produce, which only surfaced at sweep time; this
    # catches that class at test time.  Analysis only (.schema), no
    # execution: pins must stay lazy constructions.
    import bench

    qids = entrymod.queries()
    for name, fn in bench.DEFN_PIN.items():
        assert name in qids, name
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.schema.fields, name
