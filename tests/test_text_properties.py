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


# ---------------------------------------------------------------------------
# r10 session 2: clean_text + rank_thresholds property fuzz
# ---------------------------------------------------------------------------


class TestCleanTextProperties:
    """clean_text over adversarial unicode: idempotence and the
    Python-twin chain equality, batched per example set to amortize
    the Spark round trip (the module convention)."""

    @staticmethod
    def _py_clean(x: str) -> str:
        """Independent Python twin of the default clean_text chain
        (same ORDER contract: newlines, then the control/zero-width
        strip, THEN NFC, then spaces)."""
        import re
        import unicodedata

        x = re.sub("\r\n|\r|\u2028|\u2029", "\n", x)
        x = re.sub(
            "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f"
            "\u200b-\u200d\ufeff]", "", x
        )
        x = unicodedata.normalize("NFC", x)
        x = re.sub(
            "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]",
            " ", x
        )
        x = re.sub("[ \t]{2,}", " ", x)
        x = re.sub("[ \t]+\n", "\n", x)
        x = re.sub("\n{3,}", "\n\n", x)
        return re.sub(r"^\s+|\s+$", "", x)

    def test_fuzzed_unicode_matches_python_twin(self, spark):
        import random

        from data_toolz_spark.operators.text_analysis import clean_text

        alphabet = (
            list("abz .\t\n") + ["\r", "\r\n", " ", " ",
            "​", "﻿", "\x07", "é", "é", "中", "ß",
            "　", "\x1b", " ", "‌", "\u0301"]
        )
        rng = random.Random(42)
        cases = [
            (i, "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 40))))
            for i in range(300)
        ]
        df = spark.createDataFrame(cases, "id long, x string")
        got = {
            r["id"]: r["y"]
            for r in df.select(
                "id", clean_text("x").alias("y")
            ).collect()
        }
        for i, x in cases:
            assert got[i] == self._py_clean(x), (i, repr(x))
            # idempotence via the twin (chain equality already pinned)
            assert self._py_clean(got[i]) == got[i], (i, repr(got[i]))


class TestRankThresholdProperties:
    def test_fuzzed_multisets_match_exact_rank_rule(self, spark):
        """For random multisets and random fractions, the returned
        threshold is EXACTLY the ceil-rank order statistic."""
        import random

        from data_toolz_spark.operators.text_analysis import (
            rank_thresholds,
        )

        rng = random.Random(7)
        for trial in range(5):
            n = rng.randint(1, 120)
            vals = [rng.randint(-4, 4) for _ in range(n)]
            qs = []
            while len(qs) < 3:
                den = rng.randint(1, 12)
                num = rng.randint(1, den)
                if (num, den) not in qs:
                    qs.append((num, den))
            df = spark.createDataFrame(
                [(i, v) for i, v in enumerate(vals)], ["id", "v"]
            )
            got = {
                (r["q_num"], r["q_den"]): r["threshold"]
                for r in rank_thresholds(df, "v", qs).collect()
            }
            svals = sorted(vals)
            for num, den in qs:
                target = (num * n + den - 1) // den
                assert got[(num, den)] == svals[target - 1], (
                    trial, num, den, n,
                )
