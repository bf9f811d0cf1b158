"""Tokenizer evaluation metrics (operators/tokeval.py, X93)."""

import pytest

from data_toolz_spark.operators.tokeval import tokenizer_eval
from data_toolz_spark.operators.unigram import unigram_train
from data_toolz_spark.operators.wordpiece import (
    WP_UNK,
    wordpiece_base_pieces,
    wordpiece_segment_words,
    wordpiece_train,
    wordpiece_vocab,
)

WORDS = {
    "hello": 10,
    "hell": 7,
    "help": 5,
    "yellow": 6,
    "low": 9,
    "lowest": 4,
    "a": 12,
}


def _word_df(spark, wf, lang=None):
    if lang is None:
        return spark.createDataFrame(
            sorted(wf.items()), "word string, freq long"
        )
    return spark.createDataFrame(
        [(w, f, lang[w]) for w, f in sorted(wf.items())],
        "word string, freq long, lang string",
    )


def test_eval_requires_a_model(spark):
    with pytest.raises(ValueError):
        tokenizer_eval(_word_df(spark, WORDS))


def test_eval_matches_manual_weighted_arithmetic(spark):
    from data_toolz_spark.operators.bpe import bpe_train

    df = _word_df(spark, WORDS)
    bpe = bpe_train(df, n_merges=6, min_count=2)
    wpm = wordpiece_train(df, n_merges=6, min_count=2)
    wpv = wordpiece_vocab(wpm, wordpiece_base_pieces(df))
    uni = unigram_train(df, vocab_size=20, n_iter=2, max_piece_len=4)

    out = {
        r["tokenizer"]: r
        for r in tokenizer_eval(
            df, bpe_merges=bpe, wp_vocab=wpv, unigram_model=uni
        ).collect()
    }
    assert set(out) == {"bpe", "wordpiece", "unigram"}

    # twin for wordpiece: segment each distinct word with the SAME
    # kernel (already twin-pinned in test_wordpiece.py), then weight
    seg = {
        r["word"]: (r["n_pieces"], list(r["pieces"]))
        for r in wordpiece_segment_words(
            df.select("word"), wpv
        ).collect()
    }
    n_words = sum(WORDS.values())
    n_pieces = sum(f * seg[w][0] for w, f in WORDS.items())
    n_chars = sum(f * len(w) for w, f in WORDS.items())
    n_unk = sum(
        f for w, f in WORDS.items() if seg[w][1] == [WP_UNK]
    )
    row = out["wordpiece"]
    assert row["n_words"] == n_words
    assert row["n_pieces"] == n_pieces
    assert row["fertility"] == round(n_pieces / n_words, 6)
    assert row["chars_per_piece"] == round(n_chars / n_pieces, 6)
    assert row["unk_rate"] == round(n_unk / n_words, 6)

    # structural invariants across families
    for name, row in out.items():
        assert row["n_words"] == n_words
        assert row["n_pieces"] >= n_words  # >= one piece per word
        assert 0.0 <= row["unk_rate"] <= 1.0, name
    assert out["bpe"]["unk_rate"] == 0.0


def test_eval_unk_counting(spark):
    # a vocab covering ONLY 'a' → every other word is [UNK]
    wf = {"aa": 3, "zz": 1}
    df = _word_df(spark, wf)
    vocab = {WP_UNK: 0, "a": 1, "##a": 2}
    row = tokenizer_eval(df, wp_vocab=vocab).collect()[0]
    # 'aa' → 2 pieces; 'zz' → [UNK] (1 piece)
    assert row["n_words"] == 4
    assert row["n_pieces"] == 3 * 2 + 1 * 1
    assert row["unk_rate"] == round(1 / 4, 6)


def test_eval_grouped_by_language(spark):
    wf = {"hello": 4, "bonjour": 2}
    lang = {"hello": "en", "bonjour": "fr"}
    df = _word_df(spark, wf, lang)
    vocab = {
        WP_UNK: 0, "h": 1, "b": 2,
        "##e": 3, "##l": 4, "##o": 5, "##n": 6, "##j": 7,
        "##u": 8, "##r": 9,
    }
    rows = tokenizer_eval(
        df, wp_vocab=vocab, group_cols=["lang"]
    ).collect()
    got = {r["lang"]: r for r in rows}
    assert set(got) == {"en", "fr"}
    assert got["en"]["n_words"] == 4
    assert got["en"]["n_pieces"] == 4 * 5  # h ##e ##l ##l ##o
    assert got["fr"]["n_pieces"] == 2 * 7
    assert got["en"]["unk_rate"] == 0.0
