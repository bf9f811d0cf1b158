"""remove_duplicate_spans: keeper policy, overlap coverage, randomized
differential against a Python reference implementation."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.text_analysis import remove_duplicate_spans


def _run(spark, rows, n=4, min_docs=2):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_duplicate_spans(
        df, n=n, min_docs=min_docs, out_col="cleaned"
    )
    return {
        r["doc_id"]: (r["cleaned"], r["n_dropped_words"])
        for r in out.collect()
    }


def _reference(rows, n, min_docs=2):
    """Plain-Python oracle: same keeper policy, same coverage rule."""
    toks = {i: t.split() for i, t in rows}
    grams: dict[tuple, list] = {}
    for i, ws in toks.items():
        low = [w.lower() for w in ws]
        for p in range(len(ws) - n + 1):
            grams.setdefault(tuple(low[p : p + n]), []).append((i, p))
    cuts: dict[int, set] = {i: set() for i, _ in rows}
    for g, occ in grams.items():
        docs = {i for i, _ in occ}
        if len(docs) < min_docs:
            continue
        keeper = min(docs)
        for i, p in occ:
            if i != keeper:
                cuts[i].add(p)
    out = {}
    for i, t in rows:
        ws = toks[i]
        kept = [
            w
            for idx, w in enumerate(ws)
            if not any(p <= idx < p + n for p in cuts[i])
        ]
        out[i] = (
            t if not cuts[i] else " ".join(kept),
            len(ws) - len(kept) if cuts[i] else 0,
        )
    return out


def test_keeper_keeps_lowest_id(spark):
    shared = "one two three four"
    rows = [
        (1, f"intro {shared} outro"),
        (2, f"prefix {shared} suffix"),
        (3, "totally different words here"),
    ]
    got = _run(spark, rows, n=4)
    assert got[1] == (f"intro {shared} outro", 0)  # canonical, untouched
    assert got[2] == ("prefix suffix", 4)
    assert got[3] == ("totally different words here", 0)


def test_long_shared_passage_fully_cut(spark):
    """A shared passage longer than n is covered by its overlapping
    grams — the WHOLE passage goes, not just the first n words."""
    passage = "a b c d e f g h"  # 8 words, n=4 → 5 overlapping grams
    rows = [(1, f"x {passage} y"), (2, f"p {passage} q")]
    got = _run(spark, rows, n=4)
    assert got[2] == ("p q", 8)


def test_within_doc_repeat_kept(spark):
    rows = [(1, "r s t u r s t u"), (2, "different text entirely ok")]
    got = _run(spark, rows, n=4)
    assert got[1][1] == 0  # within-doc repetition is not cross-doc dup


def test_case_insensitive_matching_preserves_original_case(spark):
    rows = [(1, "Alpha Beta Gamma Delta end"), (2, "alpha beta gamma delta tail")]
    got = _run(spark, rows, n=4)
    assert got[1] == ("Alpha Beta Gamma Delta end", 0)
    assert got[2] == ("tail", 4)


def test_min_docs_threshold(spark):
    shared = "w x y z"
    rows = [(1, f"a {shared}"), (2, f"b {shared}"), (3, f"c {shared}")]
    assert all(c == 0 for _, c in _run(spark, rows, n=4, min_docs=4).values())
    got = _run(spark, rows, n=4, min_docs=3)
    assert got[1][1] == 0 and got[2][1] == 4 and got[3][1] == 4


def test_randomized_differential(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(40):
        k = rng.randint(0, 14)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    for n in (2, 3, 5):
        assert _run(spark, rows, n=n) == _reference(rows, n), f"n={n}"


def test_pathological_fully_duplicated_long_doc(spark):
    """Degenerate doc from VERDICT r6 item 7: EVERY gram duplicated
    (a long doc copied verbatim), so cuts ≈ tokens.  The interval-
    merge rebuild must collapse that to one interval — the non-keeper
    copy empties, the keeper is untouched, and the differential holds
    where the old O(tokens × cuts) coverage was quadratic."""
    words = " ".join(f"w{i % 97}x{i % 89}" for i in range(3000))
    rows = [(1, words), (2, words), (3, "short unrelated filler text")]
    got = _run(spark, rows, n=8)
    want = _reference(rows, 8)
    assert got == want
    assert got[1] == (words, 0)       # keeper byte-identical
    assert got[2] == ("", 3000)       # non-keeper fully cut
    assert got[3][1] == 0


def test_alternating_flagged_spans_merge_to_disjoint_intervals(spark):
    """Many separated duplicated spans per doc (the max-interval-count
    shape): each shared island is ≥ n apart, so intervals cannot merge
    across islands — coverage must still match the reference exactly."""
    rng = random.Random(23)
    shared = [
        " ".join(f"s{k}t{j}" for j in range(4)) for k in range(40)
    ]
    fill = lambda: " ".join(  # noqa: E731
        f"u{rng.randrange(10**6)}" for _ in range(6)
    )
    a = " ".join(x for k in range(40) for x in (shared[k], fill()))
    b = " ".join(x for k in range(40) for x in (shared[k], fill()))
    rows = [(1, a), (2, b)]
    assert _run(spark, rows, n=4) == _reference(rows, 4)


def test_layout_invariance(spark):
    rows = [(i, f"s{i} one two three four e{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(
        map(
            tuple,
            remove_duplicate_spans(df, n=4, out_col="c").collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            remove_duplicate_spans(
                df.repartition(7), n=4, out_col="c"
            ).collect(),
        )
    )
    assert a == b


def test_validation(spark):
    with pytest.raises(ValueError):
        remove_duplicate_spans(None, n=1)
    with pytest.raises(ValueError):
        remove_duplicate_spans(None, min_docs=1)
