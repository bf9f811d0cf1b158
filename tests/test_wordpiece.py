"""Distributed WordPiece training + greedy encoding
(operators/wordpiece.py).

The driver qid (text_bpe_tokens' wp_tokens fold) value-attests the
training replay + greedy encode against DuckDB; these tests pin the
operator against an INDEPENDENT pure-Python reference — likelihood
scoring, ##-marking, tie-breaks, delta-table maintenance over many
rounds, greedy longest-match inference with whole-word [UNK], and the
corpus count path.
"""

import random
from collections import Counter

import pytest

from data_toolz_spark.operators.wordpiece import (
    WP_MARK,
    wordpiece_encode,
    WP_UNK,
    load_wordpiece_model,
    save_wordpiece_model,
    wordpiece_apply_expr,
    wordpiece_base_pieces,
    wordpiece_segment_words,
    wordpiece_token_count,
    wordpiece_train,
    wordpiece_vocab,
)


def _seed_syms(w: str) -> tuple:
    return tuple(
        [w[0]] + [WP_MARK + c for c in w[1:]]
    )


def _ref_train(word_freq: dict, n_merges: int, min_count: int = 2):
    """Pure-Python WordPiece: score = cnt(l,r) / (cnt(l)*cnt(r)) as a
    Python float (int/int division — the same correctly-rounded IEEE
    double Spark computes), ties (score DESC, l ASC, r ASC), greedy
    left-to-right replace, ##-marked continuations."""
    state = {w: (_seed_syms(w), f) for w, f in word_freq.items()}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for syms, f in state.values():
            for s in syms:
                sc[s] += f
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        cands = [
            (c / (sc[p[0]] * sc[p[1]]), c, p)
            for p, c in pc.items()
            if c >= min_count
        ]
        if not cands:
            break
        score, c, (l, r) = sorted(
            cands, key=lambda t: (-t[0], t[2][0], t[2][1])
        )[0]
        merged = l + (r[len(WP_MARK):] if r.startswith(WP_MARK) else r)
        merges.append(
            {
                "rank": rank,
                "left": l,
                "right": r,
                "merged": merged,
                "pair_count": c,
                "left_count": sc[l],
                "right_count": sc[r],
                "score": score,
            }
        )
        new = {}
        for w, (syms, f) in state.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l
                    and syms[i + 1] == r
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = (tuple(out), f)
        state = new
    return merges


def _ref_segment(w: str, pieces: set) -> list:
    max_lit = max((len(p) for p in pieces), default=0)
    max_cont = max(
        (len(p) - 2 for p in pieces
         if p.startswith(WP_MARK) and len(p) > 2),
        default=0,
    )
    out, pos = [], 0
    while pos < len(w):
        lim = max_lit if pos == 0 else max_cont
        for ln in range(min(lim, len(w) - pos), 0, -1):
            key = w[pos : pos + ln]
            if pos > 0:
                key = WP_MARK + key
            if key in pieces:
                out.append(key)
                pos += ln
                break
        else:
            return [WP_UNK]
    return out or [WP_UNK]


def _word_df(spark, word_freq: dict):
    return spark.createDataFrame(
        [(w, f) for w, f in sorted(word_freq.items())],
        "word string, freq long",
    )


WORDS = {
    "hello": 10,
    "hell": 7,
    "help": 5,
    "yellow": 6,
    "low": 9,
    "lowest": 4,
    "a": 12,
    "##tag": 3,  # literal '#' data chars must not confuse the marker
    "x#y": 2,
}


def test_train_matches_python_twin(spark):
    df = _word_df(spark, WORDS)
    got = wordpiece_train(df, n_merges=10, min_count=2)
    want = _ref_train(WORDS, 10, min_count=2)
    assert [
        (m["left"], m["right"], m["merged"], m["pair_count"],
         m["left_count"], m["right_count"])
        for m in got
    ] == [
        (m["left"], m["right"], m["merged"], m["pair_count"],
         m["left_count"], m["right_count"])
        for m in want
    ]
    # scores are the same int/int IEEE division on both sides
    assert [m["score"] for m in got] == [m["score"] for m in want]


def test_train_matches_twin_randomized(spark):
    rng = random.Random(421)
    alphabet = "abcde#"
    for trial in range(3):
        wf = {}
        for _ in range(40):
            w = "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, 7))
            )
            wf[w] = wf.get(w, 0) + rng.randint(1, 9)
        got = wordpiece_train(
            _word_df(spark, wf), n_merges=14, min_count=2
        )
        want = _ref_train(wf, 14, min_count=2)
        assert [
            (m["left"], m["right"], m["merged"], m["pair_count"])
            for m in got
        ] == [
            (m["left"], m["right"], m["merged"], m["pair_count"])
            for m in want
        ], f"trial {trial}"


def test_train_driver_vs_distributed_arms(spark, monkeypatch):
    """r12 optimization round: the driver-held pair/symbol-table arm
    (under ``bpe._DRIVER_PAIR_CAP``) and the distributed-table arm
    produce identical merge lists including the IEEE score doubles —
    the cap is monkeypatched to force each arm on the same corpus."""
    import data_toolz_spark.operators.bpe as bpemod

    # the auto-local gate (r12) would otherwise take the whole loop
    # driver-local — force it off so this test still compares the
    # driver-DICT arm against the distributed-table arm
    monkeypatch.setattr(bpemod, "_LOCAL_UNIT_CAP", 0)

    rng = random.Random(733)
    wf = {}
    for _ in range(60):
        w = "".join(
            rng.choice("abcd#") for _ in range(rng.randint(1, 6))
        )
        wf[w] = wf.get(w, 0) + rng.randint(1, 9)
    df = _word_df(spark, wf)

    stats_drv: dict = {}
    got_drv = wordpiece_train(
        df, n_merges=12, min_count=2, stats=stats_drv
    )
    assert stats_drv["pair_table"] == "driver"

    monkeypatch.setattr(bpemod, "_DRIVER_PAIR_CAP", 0)
    stats_dst: dict = {}
    got_dst = wordpiece_train(
        df, n_merges=12, min_count=2, stats=stats_dst
    )
    assert stats_dst["pair_table"] == "distributed"

    key = lambda ms: [  # noqa: E731
        (m["left"], m["right"], m["merged"], m["pair_count"],
         m["left_count"], m["right_count"], m["score"])
        for m in ms
    ]
    assert key(got_drv) == key(got_dst)
    assert key(got_drv) == key(_ref_train(wf, 12, min_count=2))


def test_train_exhaustion_and_zero(spark):
    df = _word_df(spark, {"ab": 1, "cd": 1})
    # nothing reaches min_count=2 → no merges
    assert wordpiece_train(df, n_merges=5, min_count=2) == []
    assert wordpiece_train(df, n_merges=0, min_count=1) == []
    # min_count=1 exhausts after the two merges
    got = wordpiece_train(df, n_merges=9, min_count=1)
    assert [m["merged"] for m in got] == ["ab", "cd"]


def test_marker_arithmetic_on_literal_hash_words(spark):
    # '#ab' seeds as ('#', '##a', '##b'): merging ('##a','##b') must
    # yield '##ab' (marker preserved), merging ('#','##a') → '#a'
    wf = {"#ab": 5}
    got = wordpiece_train(_word_df(spark, wf), n_merges=2, min_count=1)
    want = _ref_train(wf, 2, min_count=1)
    assert [(m["left"], m["right"], m["merged"]) for m in got] == [
        (m["left"], m["right"], m["merged"]) for m in want
    ]


def test_segment_words_greedy_longest_match(spark):
    wf = WORDS
    merges = _ref_train(wf, 10, min_count=2)
    base = wordpiece_base_pieces(_word_df(spark, wf))
    vocab = wordpiece_vocab(merges, base)
    words = ["hello", "lowest", "zzz", "a", "x#y", "low"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (list(r["pieces"]), list(r["ids"]), r["n_pieces"])
        for r in wordpiece_segment_words(df, vocab).collect()
    }
    pieces = set(vocab)
    for w in words:
        seg = _ref_segment(w, pieces)
        assert got[w][0] == seg, w
        assert got[w][1] == [vocab[p] for p in seg], w
        assert got[w][2] == len(seg), w
    # 'zzz' has no vocab coverage → whole-word UNK
    assert got["zzz"][0] == [WP_UNK]


def test_segment_max_word_len(spark):
    vocab = {WP_UNK: 0, "a": 1, WP_MARK + "a": 2}
    df = spark.createDataFrame([("aaaa",), ("aa",)], "word string")
    got = {
        r["word"]: list(r["pieces"])
        for r in wordpiece_segment_words(
            df, vocab, max_word_len=3
        ).collect()
    }
    assert got["aaaa"] == [WP_UNK]
    assert got["aa"] == ["a", WP_MARK + "a"]


def test_token_count_corpus(spark):
    docs = [
        (1, "hello low hello"),
        (2, "zzz"),
        (3, ""),
        (4, "lowest help \x1fskip"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = _ref_train(WORDS, 10, min_count=2)
    base = wordpiece_base_pieces(_word_df(spark, WORDS))
    vocab = wordpiece_vocab(merges, base)
    got = {
        r["doc_id"]: r["wp_tokens"]
        for r in wordpiece_token_count(df, vocab).collect()
    }
    pieces = set(vocab)

    def n(w):
        return len(_ref_segment(w, pieces))

    assert got[1] == n("hello") + n("low") + n("hello")
    assert got[2] == n("zzz")  # UNK still counts 1
    assert got[3] == 0
    # the \x1f-containing word is skipped (word-table contract)
    assert got[4] == n("lowest") + n("help")


def test_wordpiece_encode_corpus(spark):
    docs = [
        (1, "hello low hello"),
        (2, ""),
        (3, "zzz \x1fskip low"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = _ref_train(WORDS, 10, min_count=2)
    base = wordpiece_base_pieces(_word_df(spark, WORDS))
    vocab = wordpiece_vocab(merges, base)
    got = {
        r["doc_id"]: list(r["ids"])
        for r in wordpiece_encode(df, vocab).collect()
    }
    pieces = set(vocab)

    def ids(w):
        return [vocab[p] for p in _ref_segment(w, pieces)]

    assert got[1] == ids("hello") + ids("low") + ids("hello")
    assert got[2] == []
    # \x1f word skipped, zzz -> [UNK] id 0
    assert got[3] == [0] + ids("low")


def test_vocab_ids_and_model_roundtrip(spark, tmp_path):
    merges = _ref_train(WORDS, 6, min_count=2)
    base = wordpiece_base_pieces(_word_df(spark, WORDS))
    vocab = wordpiece_vocab(merges, base)
    assert vocab[WP_UNK] == 0
    assert list(vocab.values()) == list(range(len(vocab)))
    # base pieces sort before merges; firsts before continuations
    assert base == sorted(
        [p for p in base if not p.startswith(WP_MARK)]
    ) + sorted([p for p in base if p.startswith(WP_MARK)])
    table = "wp_model_rt"
    save_wordpiece_model(spark, merges, vocab, table)
    lm, lv = load_wordpiece_model(spark, table)
    assert [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in lm
    ] == [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in merges
    ]
    assert lv == vocab
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_apply_expr_replays_training_state(spark):
    import pyspark.sql.functions as F

    wf = {"hello": 3, "low": 2}
    merges = _ref_train(wf, 4, min_count=1)
    df = spark.createDataFrame([("hello low",)], "text string")
    got = df.select(
        wordpiece_apply_expr("text", merges).alias("s")
    ).collect()[0]["s"]
    # twin: seed + sequential replace per word
    state = {w: list(_seed_syms(w)) for w in ["hello", "low"]}
    for m in merges:
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == m["left"]
                    and syms[i + 1] == m["right"]
                ):
                    out.append(m["merged"])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    sep = "\x1f"
    want = " ".join(
        sep + (sep + sep).join(state[w]) + sep for w in ["hello", "low"]
    )
    assert got == want


def test_train_validation(spark):
    df = _word_df(spark, {"ab": 2})
    with pytest.raises(ValueError):
        wordpiece_train(df, n_merges=-1)
    with pytest.raises(ValueError):
        wordpiece_train(df, n_merges=1, min_count=0)


def test_segment_literal_marker_word_start(spark):
    """Review fix (r12): at the word START every vocab key matches
    literally — including ##-prefixed and [UNK]-shaped keys — so the
    match-length ceiling there is the longest KEY, not the longest
    continuation raw.  A word starting with a literal '##' must use
    the long literal match the oracle's unmarked arm always allowed."""
    # '##ab' enters the vocab as a MERGED continuation piece (raw
    # 'ab'); the word '##abz' can consume it literally at pos 0
    vocab = {
        WP_UNK: 0, "#": 1, "z": 2,
        WP_MARK + "#": 3, WP_MARK + "a": 4, WP_MARK + "b": 5,
        WP_MARK + "z": 6, WP_MARK + "ab": 7,
    }
    words = ["##abz", "z##ab", "[UNK]z"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["pieces"])
        for r in wordpiece_segment_words(df, vocab).collect()
    }
    pieces = set(vocab)
    for w in words:
        assert got[w] == _ref_segment(w, pieces), w
    # the literal '##ab' (4 chars) beats '#'+'###'… at the start
    assert got["##abz"] == [WP_MARK + "ab", WP_MARK + "z"]
    # raw text spelling '[UNK]' literally matches the [UNK] KEY at
    # the word start (string-membership semantics, same as HF and as
    # the oracle's unmarked arm) — it is a match, not a failure
    assert got["[UNK]z"] == [WP_UNK, WP_MARK + "z"]


# ---------------------------------------------------------------------------
# r12: driver-side exact trainer over the collected unit table
# ---------------------------------------------------------------------------


def test_wp_local_differential(spark, monkeypatch):
    """wordpiece_train_local is bit-identical (including the IEEE
    score doubles) to the distributed trainer AND the pure-Python
    reference on randomized dense-reuse corpora — the score-RAISE
    regime (denominators shrinking under merges) is the hard part the
    symbol→pairs re-push index exists for."""
    import data_toolz_spark.operators.bpe as bpemod
    from data_toolz_spark.operators.wordpiece import (
        wordpiece_train_local,
    )

    # keep the comparison side DISTRIBUTED (the r12 auto-local gate
    # would delegate it right back to wordpiece_train_local)
    monkeypatch.setattr(bpemod, "_LOCAL_UNIT_CAP", 0)

    for seed, alpha, mc in ((3, "ab", 2), (19, "abc", 1), (31, "abcd", 2)):
        rng = random.Random(seed)
        wf: Counter = Counter(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
            for _ in range(300)
        )
        df = _word_df(spark, dict(wf))
        got = wordpiece_train_local(df, n_merges=16, min_count=mc)
        assert got == wordpiece_train(df, n_merges=16, min_count=mc), (
            seed,
            mc,
        )
        assert got == _ref_train(dict(wf), 16, mc), (seed, mc)


def test_wp_auto_local_arm_parity(spark, monkeypatch):
    """r12 optimization round: under-cap unit tables delegate the
    whole merge loop to the driver-local exact trainer.  The default
    call must take the local arm and equal the forced-distributed run
    bit for bit, IEEE score doubles included."""
    import data_toolz_spark.operators.bpe as bpemod

    rng = random.Random(877)
    wf = {}
    for _ in range(70):
        w = "".join(
            rng.choice("abcde#") for _ in range(rng.randint(1, 6))
        )
        wf[w] = wf.get(w, 0) + rng.randint(1, 9)
    df = _word_df(spark, wf)

    st_local: dict = {}
    got_local = wordpiece_train(
        df, n_merges=14, min_count=2, stats=st_local
    )
    assert st_local["pair_table"] == "local"

    monkeypatch.setattr(bpemod, "_LOCAL_UNIT_CAP", 0)
    st_dist: dict = {}
    got_dist = wordpiece_train(
        df, n_merges=14, min_count=2, stats=st_dist
    )
    assert st_dist["pair_table"] in ("driver", "distributed")

    assert got_local == got_dist
    assert got_local == _ref_train(wf, 14, min_count=2)


def test_wp_local_exhaustion_truncation_validation(spark, monkeypatch):
    """Early exhaustion parity; max_units truncation equals the
    distributed trainer on the explicit top-N sub-table; input
    validation."""
    from pyspark.sql import functions as F

    import data_toolz_spark.operators.bpe as bpemod
    from data_toolz_spark.operators.wordpiece import (
        wordpiece_train_local,
    )

    # keep the comparison sides DISTRIBUTED (see above)
    monkeypatch.setattr(bpemod, "_LOCAL_UNIT_CAP", 0)

    df = _word_df(spark, WORDS)
    got = wordpiece_train_local(df, n_merges=500, min_count=2)
    assert got == wordpiece_train(df, n_merges=500, min_count=2)
    assert 0 < len(got) < 500  # genuinely exhausted early

    st: dict = {}
    top4 = df.orderBy(F.col("freq").desc(), F.col("word")).limit(4)
    got_t = wordpiece_train_local(
        df, n_merges=8, min_count=1, max_units=4, stats=st
    )
    assert got_t == wordpiece_train(top4, n_merges=8, min_count=1)
    assert st["units_kept"] == 4 and st["units_total"] == len(WORDS)

    with pytest.raises(ValueError, match="n_merges"):
        wordpiece_train_local(df, n_merges=-1)
    with pytest.raises(ValueError, match="min_count"):
        wordpiece_train_local(df, n_merges=1, min_count=0)


def test_wp_local_hypothesis_differential(spark):
    """Property: for ANY word-frequency table, wordpiece_train_local
    equals the pure-Python reference bit-for-bit (scores included)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_toolz_spark.operators.wordpiece import (
        wordpiece_train_local,
    )

    word = st.text(alphabet="abc", min_size=1, max_size=6)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(
        wf=st.dictionaries(
            word, st.integers(min_value=1, max_value=50),
            min_size=1, max_size=20,
        ),
        mc=st.sampled_from([1, 2]),
    )
    def prop(wf, mc):
        df = _word_df(spark, dict(wf))
        got = wordpiece_train_local(df, n_merges=10, min_count=mc)
        assert got == _ref_train(dict(wf), 10, mc)

    prop()
