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


# ---------------------------------------------------------------------------
# pack_token_sequences: the pretraining shard format
# ---------------------------------------------------------------------------


def _spark_order(spark, ids, n_shards, seed):
    """Resolve the (shard, order-key) the operator uses via Spark's own
    xxhash64 — the twin shares the hash, diffs the PACKING logic."""
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = df.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(n_shards))
        .cast("int").alias("shard"),
        F.xxhash64("doc_id", F.lit(seed + 1)).alias("ok"),
    ).collect()
    return {r["doc_id"]: (r["shard"], r["ok"]) for r in rows}


def _ref_sequences(spark, docs, *, seq_len, eos, n_shards, seed,
                   drop_last=True):
    order = _spark_order(spark, [d for d, _ in docs], n_shards, seed)
    by_shard = {}
    for doc_id, ids in docs:
        s, ok = order[doc_id]
        by_shard.setdefault(s, []).append((ok, doc_id, ids))
    out = {}
    for s, members in by_shard.items():
        stream = []
        for _, _, ids in sorted(members, key=lambda t: (t[0], t[1])):
            stream.extend(list(ids) + [eos])
        for i in range(0, len(stream), seq_len):
            chunk = stream[i : i + seq_len]
            if drop_last and len(chunk) < seq_len:
                continue
            out[(s, i // seq_len)] = chunk
    return out


def _tok_docs(n=60, seed=5, max_len=37):
    import random

    rng = random.Random(seed)
    return [
        (i, [rng.randrange(0, 1000) for _ in range(rng.randrange(0, max_len))])
        for i in range(n)
    ]


def test_token_pack_matches_python_twin(spark):
    from data_toolz_spark.operators.sampling import pack_token_sequences

    docs = _tok_docs()
    df = spark.createDataFrame(docs, "doc_id long, ids array<int>")
    got = {
        (r["shard"], r["seq_index"]): list(r["input_ids"])
        for r in pack_token_sequences(
            df, id_col="doc_id", ids_col="ids", seq_len=16,
            eos_id=-99, n_shards=4, seed=7,
        ).collect()
    }
    want = _ref_sequences(
        spark, docs, seq_len=16, eos=-99, n_shards=4, seed=7
    )
    assert got == want
    assert all(len(v) == 16 for v in got.values())
    # a long doc (> seq_len) must span sequences intact
    long_doc = [(500, list(range(100, 170)))]
    df2 = spark.createDataFrame(long_doc, "doc_id long, ids array<int>")
    got2 = {
        (r["shard"], r["seq_index"]): list(r["input_ids"])
        for r in pack_token_sequences(
            df2, id_col="doc_id", ids_col="ids", seq_len=16,
            eos_id=-99, n_shards=2, seed=7, drop_last=False,
        ).collect()
    }
    want2 = _ref_sequences(
        spark, long_doc, seq_len=16, eos=-99, n_shards=2, seed=7,
        drop_last=False,
    )
    assert got2 == want2
    flat = [t for k in sorted(got2) for t in got2[k]]
    assert flat == list(range(100, 170)) + [-99]


def test_token_pack_partition_invariance_and_drop_last(spark):
    from data_toolz_spark.operators.sampling import pack_token_sequences

    docs = _tok_docs(n=80, seed=11)
    df1 = spark.createDataFrame(docs, "doc_id long, ids array<int>").repartition(1)
    df2 = spark.createDataFrame(docs, "doc_id long, ids array<int>").repartition(13)
    key = lambda out: {
        (r["shard"], r["seq_index"]): list(r["input_ids"])
        for r in out.collect()
    }
    kw = dict(id_col="doc_id", ids_col="ids", seq_len=32, eos_id=0,
              n_shards=8, seed=3)
    a = key(pack_token_sequences(df1, **kw))
    b = key(pack_token_sequences(df2, **kw))
    assert a == b
    # drop_last=False keeps each shard's trailing partial and conserves
    # EVERY token: Σ lens == Σ (doc len + 1)
    full = key(pack_token_sequences(df1, drop_last=False, **kw))
    assert sum(len(v) for v in full.values()) == sum(
        len(ids) + 1 for _, ids in docs
    )
    # empty / NULL ids docs contribute exactly one EOS
    ed = spark.createDataFrame(
        [(1, []), (2, None)], "doc_id long, ids array<int>"
    )
    eout = key(pack_token_sequences(ed, drop_last=False, **kw))
    assert sum(len(v) for v in eout.values()) == 2
    assert all(set(v) == {0} for v in eout.values())


def test_token_pack_validation(spark):
    from data_toolz_spark.operators.sampling import pack_token_sequences

    df = spark.createDataFrame([(1, [1, 2])], "doc_id long, ids array<int>")
    with pytest.raises(ValueError, match="seq_len"):
        pack_token_sequences(
            df, id_col="doc_id", ids_col="ids", seq_len=1, eos_id=0
        )
    with pytest.raises(ValueError, match="n_shards"):
        pack_token_sequences(
            df, id_col="doc_id", ids_col="ids", seq_len=8, eos_id=0,
            n_shards=0,
        )


def test_portable_order_matches_hashlib_twin(spark):
    """portable=True shard order is replayable in PLAIN PYTHON: the
    md5-prefix hash twin reproduces the full manifest and every packed
    sequence with no Spark hash resolution — the oracle-ability
    contract the xxhash64 default can't offer."""
    import hashlib

    from data_toolz_spark.operators.sampling import (
        export_training_shards,
        pack_token_sequences,
    )

    def h(v, seed):
        return int(
            hashlib.md5(f"{v}|{seed}".encode()).hexdigest()[:15], 16
        )

    docs = _tok_docs(n=50, seed=9)
    df = spark.createDataFrame(docs, "doc_id long, ids array<int>")
    df = df.withColumn("n_tokens", F.size("ids") + F.lit(1))

    # manifest twin
    m = export_training_shards(
        df, id_col="doc_id", token_col="n_tokens", budget=64,
        n_shards=4, seed=5, portable=True,
    )
    got = {
        (r["shard"], r["pack_bin"]): tuple(r["doc_ids"])
        for r in m.collect()
    }
    by_shard = {}
    for doc_id, ids in docs:
        by_shard.setdefault(h(doc_id, 5) % 4, []).append(
            (h(doc_id, 6), doc_id, len(ids) + 1)
        )
    want = {}
    for s, members in by_shard.items():
        start = 0
        for _, doc_id, n in sorted(members):
            want.setdefault((s, start // 64), []).append(doc_id)
            start += n
    assert got == {k: tuple(v) for k, v in want.items()}

    # packed-sequence twin
    seqs = {
        (r["shard"], r["seq_index"]): list(r["input_ids"])
        for r in pack_token_sequences(
            df, id_col="doc_id", ids_col="ids", seq_len=16, eos_id=-1,
            n_shards=4, seed=5, portable=True, drop_last=False,
        ).collect()
    }
    want_seqs = {}
    for s, members in by_shard.items():
        stream = []
        for _, doc_id, _ in sorted(members):
            stream.extend(dict(docs)[doc_id] + [-1])
        for i in range(0, len(stream), 16):
            want_seqs[(s, i // 16)] = stream[i : i + 16]
    assert seqs == want_seqs


# ---------------------------------------------------------------------------
# doc_spans (r11, VERDICT task 3): boundary metadata for attention
# masking — spans tile each sequence and reconstruct every document
# ---------------------------------------------------------------------------


def test_token_pack_spans_tile_and_reconstruct(spark):
    from data_toolz_spark.operators.sampling import pack_token_sequences

    docs = _tok_docs(n=50, seed=3)
    df = spark.createDataFrame(docs, "doc_id long, ids array<int>")
    rows = pack_token_sequences(
        df, id_col="doc_id", ids_col="ids", seq_len=16, eos_id=-99,
        n_shards=3, seed=7, drop_last=False, with_spans=True,
    ).collect()
    rebuilt = {}
    for r in rows:
        seq = list(r["input_ids"])
        spans = [
            (s["doc_id"], s["start"], s["len"]) for s in r["doc_spans"]
        ]
        # spans tile the sequence exactly: sorted, contiguous, no gaps
        assert spans == sorted(spans, key=lambda s: s[1])
        pos = 0
        for d, start, ln in spans:
            assert start == pos and ln >= 1
            pos += ln
        assert pos == len(seq)
        for d, start, ln in spans:
            rebuilt.setdefault(d, []).append(
                (r["shard"], r["seq_index"], start, seq[start : start + ln])
            )
    # every document reconstructs exactly: concatenate its spans in
    # (shard, seq, start) order, drop the single trailing eos
    for doc_id, ids in docs:
        parts = sorted(rebuilt[doc_id])
        toks = [t for _, _, _, p in parts for t in p]
        assert toks[-1] == -99, doc_id
        assert toks[:-1] == list(ids), doc_id
    # span metadata never changes input_ids themselves
    plain = {
        (r["shard"], r["seq_index"]): list(r["input_ids"])
        for r in pack_token_sequences(
            df, id_col="doc_id", ids_col="ids", seq_len=16, eos_id=-99,
            n_shards=3, seed=7, drop_last=False,
        ).collect()
    }
    got = {
        (r["shard"], r["seq_index"]): list(r["input_ids"]) for r in rows
    }
    assert got == plain


def test_token_pack_spans_partition_invariance(spark):
    from data_toolz_spark.operators.sampling import pack_token_sequences

    docs = _tok_docs(n=70, seed=9)
    kw = dict(
        id_col="doc_id", ids_col="ids", seq_len=16, eos_id=-99,
        n_shards=4, seed=7, drop_last=False, with_spans=True,
    )
    key = lambda out: {
        (r["shard"], r["seq_index"]): (
            list(r["input_ids"]),
            [(s["doc_id"], s["start"], s["len"]) for s in r["doc_spans"]],
        )
        for r in out.collect()
    }
    df1 = spark.createDataFrame(docs, "doc_id long, ids array<int>").repartition(1)
    df2 = spark.createDataFrame(docs, "doc_id long, ids array<int>").repartition(11)
    assert key(pack_token_sequences(df1, **kw)) == key(
        pack_token_sequences(df2, **kw)
    )
