"""Property-based differential tests for the round-5 text/sampling
operators: Spark results vs straightforward Python oracles on random
inputs.  Spark-calling properties cap example counts (each example is
a full job); the pure-math property runs at full fuzz width."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SPARK_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


# -- mixture_rates: pure math, full width -----------------------------------

counts_strategy = st.dictionaries(
    st.sampled_from(["web", "books", "code", "wiki", "forums"]),
    st.integers(min_value=1, max_value=10**9),
    min_size=1,
    max_size=5,
)


@settings(deadline=None)
@given(
    counts=counts_strategy,
    target=st.integers(min_value=0, max_value=10**9),
    temperature=st.sampled_from([0.25, 0.5, 1.0, 2.0, 5.0, 100.0]),
)
def test_mixture_rates_invariants(counts, target, temperature):
    from data_toolz_spark.operators.sampling import mixture_rates

    rates = mixture_rates(
        counts, target_rows=target, temperature=temperature
    )
    assert set(rates) == set(counts)
    assert all(r >= 0 for r in rates.values())
    # expected totals hit the target exactly
    expected = sum(rates[s] * counts[s] for s in counts)
    assert abs(expected - target) <= max(1e-6 * max(target, 1), 1e-6)
    # temperature > 1 flattens: smaller sources get relatively higher
    # rates — rate ordering is inverse to count ordering
    if temperature > 1.0 and len(counts) > 1 and target > 0:
        by_count = sorted(counts, key=counts.get)
        rs = [rates[s] for s in by_count]
        assert all(a >= b - 1e-12 for a, b in zip(rs, rs[1:]))


# -- chunk_documents: reconstruction property -------------------------------

@settings(**SPARK_SETTINGS)
@given(
    max_words=st.integers(min_value=1, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.99),
    lengths=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=12
    ),
)
def test_chunk_documents_reconstruction_property(
    spark, max_words, overlap_frac, lengths
):
    from data_toolz_spark.operators.text_analysis import chunk_documents

    overlap = min(int(max_words * overlap_frac), max_words - 1)
    stride = max_words - overlap
    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(
        df, max_words=max_words, overlap=overlap
    ).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_index"]] = r
    for i, n in enumerate(lengths):
        words = [f"d{i}w{j}" for j in range(n)]
        if n == 0:
            assert i not in got
            continue
        chunks = got[i]
        expected_count = max(1, -(-(n - overlap) // stride))
        assert sorted(chunks) == list(range(expected_count))
        for ci, r in chunks.items():
            expect = words[ci * stride : ci * stride + max_words]
            assert r["chunk_text"].split() == expect
            assert r["n_words"] == len(expect)


# -- line_dedup: differential vs a Python oracle ----------------------------

line_vocab = ["aa", "bb", "cc", "dd", " ee ", ""]


@settings(**SPARK_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(line_vocab), min_size=0, max_size=6),
        min_size=1,
        max_size=10,
    ),
    max_doc_freq=st.integers(min_value=1, max_value=4),
)
def test_line_dedup_matches_python_oracle(spark, docs, max_doc_freq):
    from collections import Counter

    from data_toolz_spark.operators.text_analysis import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in line_dedup(df, max_doc_freq=max_doc_freq).collect()
    }

    # oracle: count DISTINCT docs per trimmed non-empty line
    df_counts = Counter()
    for lines in docs:
        seen = {ln.strip() for ln in ("\n".join(lines)).split("\n")}
        for t in seen:
            if len(t) >= 1:
                df_counts[t] += 1
    over = {t for t, c in df_counts.items() if c > max_doc_freq}
    for i, lines in enumerate(docs):
        raw = ("\n".join(lines)).split("\n")
        kept = [ln for ln in raw if not (
            len(ln.strip()) >= 1 and ln.strip() in over
        )]
        removed = len(raw) - len(kept)
        assert got[i] == ("\n".join(kept), len(raw), removed), (i, raw)


# -- n-gram construction: the zip_with formulation vs brute force -----------

word_strategy = st.lists(
    st.sampled_from(["a", "bb", "ccc", "x1", "0", "bb"]),  # dups included
    min_size=0,
    max_size=12,
)


@settings(**SPARK_SETTINGS)
@given(
    docs=st.lists(word_strategy, min_size=1, max_size=8),
    n=st.integers(min_value=1, max_value=5),
)
def test_gram_construction_matches_bruteforce(spark, docs, n):
    """_grams_of_words builds grams via n-1 chained zip_with passes
    with a truncating slice — property-pinned against the obvious
    Python set-of-joined-windows oracle, covering n=1, docs shorter
    than n, and duplicate grams (array_distinct)."""
    from pyspark.sql import functions as F

    from data_toolz_spark.operators.decontamination import (
        _grams_of_words,
        _words,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: sorted(r["g"])
        for r in df.select(
            "doc_id",
            _grams_of_words(_words(F.col("text")), n).alias("g"),
        ).collect()
    }
    for i, ws in enumerate(docs):
        expect = sorted(
            {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}
        )
        assert got[i] == expect, (i, ws, n)
