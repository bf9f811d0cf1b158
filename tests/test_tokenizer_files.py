"""Tokenizer model file interop (operators/tokenizer_files.py):
GPT-2 merges.txt/vocab.json, BERT vocab.txt, unigram piece/count TSV
— round-trip exactness and encode-equality under reloaded models."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.bpe import (
    bpe_base_chars,
    bpe_token_count_expr,
    bpe_train,
    bpe_vocab,
    bpe_word_table,
)
from data_toolz_spark.operators.tokenizer_files import (
    MERGES_VERSION,
    load_bpe_files,
    load_unigram_tsv,
    load_wordpiece_vocab,
    save_bpe_files,
    save_unigram_tsv,
    save_wordpiece_vocab,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            ("low lower lowest newest widest",),
            ("the newest low wide news",),
        ],
        "text string",
    )


def test_bpe_files_roundtrip_and_encode_equality(spark, corpus, tmp_path):
    wt = bpe_word_table(corpus)
    merges = bpe_train(wt, n_merges=8, min_count=2)
    vocab = bpe_vocab(merges, bpe_base_chars(wt))
    d = str(tmp_path / "gpt2")
    save_bpe_files(spark, d, merges, vocab)

    raw = open(f"{d}/merges.txt").read()
    assert raw.startswith(MERGES_VERSION + "\n")
    assert len(raw.strip().splitlines()) == 1 + len(merges)

    m2, v2 = load_bpe_files(spark, d)
    assert v2 == vocab
    assert [(m["left"], m["right"], m["merged"]) for m in m2] == [
        (m["left"], m["right"], m["merged"]) for m in merges
    ]
    assert [m["rank"] for m in m2] == list(range(len(merges)))
    # the encoders only read left/right/merged — token counts under
    # the reloaded list are identical
    got = corpus.select(
        bpe_token_count_expr("text", merges).alias("a"),
        bpe_token_count_expr("text", m2).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in got)


def test_bpe_files_whitespace_symbol_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="whitespace"):
        save_bpe_files(
            spark,
            str(tmp_path / "bad"),
            [{"rank": 0, "left": "a b", "right": "c", "merged": "a bc"}],
            {},
        )


def test_wordpiece_vocab_txt_roundtrip(spark, corpus, tmp_path):
    from data_toolz_spark.operators.wordpiece import (
        wordpiece_base_pieces,
        wordpiece_train,
        wordpiece_vocab,
    )

    wt = bpe_word_table(corpus)
    merges = wordpiece_train(wt, n_merges=6, min_count=2)
    vocab = wordpiece_vocab(merges, wordpiece_base_pieces(wt))
    p = str(tmp_path / "vocab.txt")
    save_wordpiece_vocab(spark, p, vocab)
    assert load_wordpiece_vocab(spark, p) == vocab
    # line number IS the id
    lines = open(p).read().splitlines()
    assert lines[0] == "[UNK]"
    with pytest.raises(ValueError, match="contiguous"):
        save_wordpiece_vocab(
            spark, str(tmp_path / "gap.txt"), {"a": 0, "b": 2}
        )


def test_unigram_tsv_roundtrip(spark, corpus, tmp_path):
    from data_toolz_spark.operators.unigram import (
        unigram_train,
        unigram_word_table,
    )

    model = unigram_train(
        unigram_word_table(corpus), vocab_size=24, n_iter=2
    )
    p = str(tmp_path / "unigram.tsv")
    save_unigram_tsv(spark, p, model)
    m2 = load_unigram_tsv(spark, p)
    assert m2.pieces == model.pieces
    assert m2.counts == model.counts
