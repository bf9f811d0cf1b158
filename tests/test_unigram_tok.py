"""Unigram-LM tokenizer (X86, r10): exact differential vs a pure-
Python twin of the hard-EM trainer, repartition invariance,
coverage/pruning contracts, the corpus encode join path, and model
persistence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.unigram import (
    UNK_PIECE,
    load_unigram_model,
    save_unigram_model,
    unigram_encode,
    unigram_segment_words,
    unigram_train,
    unigram_word_table,
)


def _ref_better(cand, cur):
    if cur is None:
        return True
    if cand[0] != cur[0]:
        return cand[0] > cur[0]
    if cand[1] != cur[1]:
        return cand[1] > cur[1]
    return cand[2] < cur[2]  # lexicographically SMALLER pieces win


def _ref_viterbi(word, scores, max_len):
    n = len(word)
    NEG = -1e18
    best = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(n):
        if best[i] is None:
            continue
        s0, np0, ps0 = best[i]
        for j in range(i + 1, min(n, i + max_len) + 1):
            sc = scores.get(word[i:j])
            if sc is None:
                continue
            cand = (s0 + sc, np0 - 1, ps0 + (word[i:j],))
            if _ref_better(cand, best[j]):
                best[j] = cand
        cand = (s0 + NEG, np0 - 1, ps0 + (word[i : i + 1],))
        if _ref_better(cand, best[i + 1]):
            best[i + 1] = cand
    return best[n][2]


def _ref_train(word_freqs, *, vocab_size, n_iter, max_piece_len,
               seed_size, min_count, shrink):
    """Independent re-implementation of the documented algorithm."""
    seed: dict = {}
    for w, f in word_freqs.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece_len) + 1):
                seed[w[i:j]] = seed.get(w[i:j], 0) + f
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items()
         if len(p) > 1 and c >= min_count),
        key=lambda x: (-x[1], x[0]),
    )[: max(0, seed_size - len(chars))]
    counts = dict(chars)
    counts.update(dict(multi))
    for it in range(n_iter):
        total = sum(counts.values())
        scores = {p: math.log(c / total)
                  for p, c in counts.items() if c > 0}
        new_counts: dict = {}
        for w, f in word_freqs.items():
            for p in _ref_viterbi(w, scores, max_piece_len):
                if p in counts:
                    new_counts[p] = new_counts.get(p, 0) + f
        for ch in chars:
            new_counts.setdefault(ch, 0)
        n_multi_target = max(
            vocab_size - 1 - len(chars),
            math.ceil(
                sum(1 for p in new_counts if len(p) > 1)
                * (shrink if it < n_iter - 1 else 0.0)
            ),
        )
        multis = sorted(
            ((p, c) for p, c in new_counts.items()
             if len(p) > 1 and c > 0),
            key=lambda x: (-x[1], x[0]),
        )[: max(0, n_multi_target)]
        counts = {p: c for p, c in new_counts.items() if len(p) == 1}
        counts.update(dict(multis))
    ordered = sorted(
        counts.items(), key=lambda x: (-x[1], x[0])
    )[: vocab_size - 1]
    kept = {p for p, _ in ordered}
    for ch in chars:
        if ch not in kept:
            ordered.append((ch, counts.get(ch, 0)))
    ordered = sorted(ordered, key=lambda x: (-x[1], x[0]))
    return (UNK_PIECE,) + tuple(p for p, _ in ordered), \
        (0,) + tuple(c for _, c in ordered)


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps under the warm sun",
    "quick thinking wins the day every day",
    "brown bread and warm butter every morning",
    "the lazy afternoon sun over the brown field",
    "dogs and cats sleep every lazy afternoon",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id long, text string",
    )


PARAMS = dict(
    vocab_size=48, n_iter=3, max_piece_len=6, seed_size=256,
    min_count=2, shrink=0.75,
)


def test_train_matches_python_twin(spark, docs):
    words = unigram_word_table(docs)
    model = unigram_train(words, **PARAMS)
    wf = {
        r["word"]: r["freq"] for r in words.collect()
    }
    ref_pieces, ref_counts = _ref_train(wf, **PARAMS)
    assert model.pieces == ref_pieces
    assert model.counts == ref_counts
    assert model.pieces[0] == UNK_PIECE and model.size <= 48


def test_train_repartition_invariance(spark, docs):
    words = unigram_word_table(docs)
    a = unigram_train(words, **PARAMS)
    b = unigram_train(words.repartition(13), **PARAMS)
    assert a.pieces == b.pieces and a.counts == b.counts


def test_vocab_too_small_for_alphabet_raises(spark, docs):
    words = unigram_word_table(docs)
    with pytest.raises(ValueError, match="alphabet"):
        unigram_train(words, **{**PARAMS, "vocab_size": 5})


def test_segmentations_reassemble_words(spark, docs):
    words = unigram_word_table(docs)
    model = unigram_train(words, **PARAMS)
    seg = unigram_segment_words(
        words.select("word"), model, max_piece_len=6
    ).collect()
    assert seg
    for r in seg:
        assert "".join(r["pieces"]) == r["word"]
        assert all(i > 0 for i in r["ids"])  # full coverage: no unk
        # multi-char pieces actually formed (not char-shattered
        # everywhere)
    assert any(len(r["pieces"]) < len(r["word"]) for r in seg)


def test_unknown_characters_map_to_unk(spark):
    train_docs = spark.createDataFrame(
        [(0, "abba baab abab")], "doc_id long, text string"
    )
    model = unigram_train(
        unigram_word_table(train_docs),
        vocab_size=8, n_iter=2, max_piece_len=4, seed_size=64,
        min_count=1,
    )
    seg = unigram_segment_words(
        spark.createDataFrame([("abzba",)], "word string"),
        model,
        max_piece_len=4,
    ).collect()[0]
    assert "".join(seg["pieces"]) == "abzba"
    assert 0 in seg["ids"]  # z → <unk>
    z_pos = seg["pieces"].index("z")
    assert seg["ids"][z_pos] == 0


def test_encode_round_trips_by_id_lookup(spark, docs):
    words = unigram_word_table(docs)
    model = unigram_train(words, **PARAMS)
    out = unigram_encode(docs, model).collect()
    assert len(out) == len(CORPUS)
    id2p = dict(enumerate(model.pieces))
    for r in out:
        decoded = "".join(id2p[i] for i in r["ids"])
        assert decoded == CORPUS[r["doc_id"]].replace(" ", "")
    # empty doc yields an empty array
    empty = spark.createDataFrame(
        [(99, "   ")], "doc_id long, text string"
    )
    got = unigram_encode(empty, model).collect()[0]
    assert got["ids"] == []


def test_model_persistence_round_trip(spark, docs):
    from data_toolz_spark.catalog import drop_stale_table

    words = unigram_word_table(docs)
    model = unigram_train(words, **PARAMS)
    table = "t_unigram_model"
    drop_stale_table(spark, table)
    save_unigram_model(spark, model, table)
    loaded = load_unigram_model(spark, table)
    assert loaded.pieces == model.pieces
    assert loaded.counts == model.counts
    drop_stale_table(spark, table)


def test_viterbi_tie_breaks_to_smaller_piece_sequence():
    """Equal score + equal piece count → the lexicographically
    SMALLER piece tuple wins (the documented portable rule; a plain
    tuple max would pick the larger one)."""
    from data_toolz_spark.operators.unigram import _viterbi

    scores = {"ab": -1.0, "a": -0.5, "b": -0.5, "ba": -1.0}
    # 'abab': ('ab','ab') vs ('a','ba','b') — different piece counts;
    # craft an exact tie instead: 'aba' with {'ab','a'} vs {'a','ba'}
    # both = score('ab'/'ba') + score('a') and both 2 pieces
    got = _viterbi("aba", scores, 2)
    assert got == ("a", "ba")  # smaller than ('ab', 'a')


def test_encode_limit_defaults_to_model_longest_piece(spark):
    """r11 (advice): a model trained with max_piece_len > 8 must
    reproduce its training segmentations at encode time WITHOUT the
    caller re-passing the limit — the default derives from the
    longest real piece instead of a hardcoded 8."""
    docs = spark.createDataFrame(
        [(i, "commonlongword tail") for i in range(40)]
        + [(100 + i, "tail xyz") for i in range(4)],
        ["doc_id", "text"],
    )
    words = unigram_word_table(docs)
    model = unigram_train(
        words, vocab_size=40, n_iter=2, max_piece_len=14,
        seed_size=512, min_count=1,
    )
    # the 14-char word must have survived as one piece for the test
    # to bite (with a hardcoded 8 it could never match at encode time)
    assert "commonlongword" in model.pieces
    assert model.max_piece_len >= 14
    seg = {
        r["word"]: tuple(r["pieces"])
        for r in unigram_segment_words(
            words.select("word"), model
        ).collect()
    }
    assert seg["commonlongword"] == ("commonlongword",)
    # persistence keeps the derived limit (pieces round-trip)
    table = "t_unigram_mpl_rt"
    save_unigram_model(spark, model, table)
    loaded = load_unigram_model(spark, table)
    assert loaded.max_piece_len == model.max_piece_len
    spark.sql(f"DROP TABLE IF EXISTS {table}")


# ---------------------------------------------------------------------------
# r12 (VERDICT r11 task 6): n-best segmentations — the subword-
# regularization export.  Twin = exhaustive enumeration of every
# segmentation (left-to-right float accumulation, same as the DP),
# sorted by the documented total order.
# ---------------------------------------------------------------------------


def _ref_all_segs(word, scores, max_len):
    NEG = -1e18
    out = []

    def rec(i, s0, np0, ps0):
        if i == len(word):
            out.append((s0, np0, ps0))
            return
        for j in range(i + 1, min(len(word), i + max_len) + 1):
            piece = word[i:j]
            sc = scores.get(piece)
            if sc is None:
                if j == i + 1:
                    sc = NEG
                else:
                    continue
            rec(j, s0 + sc, np0 - 1, ps0 + (piece,))

    rec(0, 0.0, 0, ())
    return sorted(out, key=lambda c: (-c[0], -c[1], c[2]))


def test_nbest_matches_exhaustive_twin_and_head_is_viterbi(spark, docs):
    from data_toolz_spark.operators.unigram import (
        unigram_nbest_segment_words,
    )

    words = unigram_word_table(docs)
    model = unigram_train(words, **PARAMS)
    scores = model.scores()
    max_len = model.max_piece_len
    probe = words.select("word").union(
        spark.createDataFrame([("zebra!9",), ("day",)], "word string")
    )
    got = {
        r["word"]: r
        for r in unigram_nbest_segment_words(probe, model, n=4).collect()
    }
    single = {
        r["word"]: tuple(r["pieces"])
        for r in unigram_segment_words(probe, model).collect()
    }
    piece_id = {p: i for i, p in enumerate(model.pieces)}
    assert set(got) == set(single)
    for w, r in got.items():
        want = _ref_all_segs(w, scores, max_len)[:4]
        assert [tuple(s) for s in r["segs"]] == [ps for _, _, ps in want], w
        assert list(r["logprobs"]) == [s for s, _, _ in want], w
        assert [list(i) for i in r["ids"]] == [
            [piece_id.get(p, 0) for p in ps] for _, _, ps in want
        ], w
        # the head of the list IS today's single-best segmentation
        assert tuple(r["segs"][0]) == single[w], w
        assert len(r["segs"]) >= 1


def test_nbest_n1_equals_segment_words(spark, docs):
    from data_toolz_spark.operators.unigram import (
        unigram_nbest_segment_words,
    )

    words = unigram_word_table(docs)
    model = unigram_train(words, **PARAMS)
    one = {
        r["word"]: ([tuple(s) for s in r["segs"]], list(r["ids"][0]))
        for r in unigram_nbest_segment_words(words, model, n=1).collect()
    }
    base = {
        r["word"]: (tuple(r["pieces"]), list(r["ids"]))
        for r in unigram_segment_words(words, model).collect()
    }
    assert set(one) == set(base)
    for w, (segs, ids0) in one.items():
        assert len(segs) == 1
        assert segs[0] == base[w][0]
        assert ids0 == base[w][1]
    with pytest.raises(ValueError, match="n must be >= 1"):
        unigram_nbest_segment_words(words, model, n=0)
