"""Property-based differential test of the Filter DSL compiler.

For random (spec, records) pairs the compiled ``Column`` (evaluated by
Spark with 3-valued logic, null-as-false projection) must agree row for
row with the driver-side Python evaluator (``Filter.__call__``), which
implements the reference's matcher semantics.  This is the strongest
check on the SQL-NULL vs Python-False mapping (SURVEY §7.4.1).

Type discipline in the generators mirrors the DSL's sane domain: the
reference raises TypeError when ``numeric`` meets a non-numeric value,
so numeric criteria only target numeric non-null fields — same contract,
same coverage as the reference's own tests, plus fuzzing.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_toolz_spark.plans.filtering import Filter, compile_filter

SCHEMA = (
    "idx long, i long, d double, s string, b boolean, n struct<x: long>"
)

# -- record strategy --------------------------------------------------------

ints = st.integers(min_value=-5, max_value=5)
doubles = st.sampled_from([-2.5, -1.0, 0.0, 0.5, 1.0, 3.25])
strings = st.sampled_from(["", "a", "ab", "abc", "b", "ba", "zig"])


records = st.fixed_dictionaries(
    {
        "i": ints,
        "d": doubles,
        "s": st.one_of(st.none(), strings),
        "b": st.one_of(st.none(), st.booleans()),
        "n": st.fixed_dictionaries({"x": ints}),
    }
)

# -- criteria strategies (typed per field) ----------------------------------


def eq_or_anything_but(values: st.SearchStrategy) -> st.SearchStrategy:
    listed = st.lists(st.one_of(st.none(), values), min_size=0, max_size=3)
    return st.one_of(
        values,
        st.none(),
        st.builds(lambda v: {"anything-but": v}, listed),
    )


def numeric_chain(values: st.SearchStrategy) -> st.SearchStrategy:
    op = st.sampled_from(["=", ">", ">=", "<", "<="])
    pairs = st.lists(st.tuples(op, values), min_size=1, max_size=2)
    return st.builds(
        lambda ps: {"numeric": [x for p in ps for x in p]}, pairs
    )


exists_crit = st.builds(lambda v: {"exists": v}, st.booleans())
prefix_crit = st.builds(lambda p: {"prefix": p}, st.sampled_from(["", "a", "ab", "z"]))

crit_i = st.one_of(eq_or_anything_but(ints), numeric_chain(ints), exists_crit)
crit_d = st.one_of(
    eq_or_anything_but(doubles), numeric_chain(doubles), exists_crit
)
crit_s = st.one_of(eq_or_anything_but(strings), prefix_crit, exists_crit)
crit_b = st.one_of(st.booleans(), st.none(), exists_crit)
crit_missing = st.one_of(eq_or_anything_but(ints), exists_crit, prefix_crit)


def crit_list(crit: st.SearchStrategy) -> st.SearchStrategy:
    return st.lists(crit, min_size=1, max_size=2)


field_entries = st.fixed_dictionaries(
    {},
    optional={
        "i": crit_list(crit_i),
        "d": crit_list(crit_d),
        "s": crit_list(crit_s),
        "b": crit_list(crit_b),
        "zz": crit_list(crit_missing),  # statically-absent field
        "n": st.fixed_dictionaries({"x": crit_list(crit_i)}),  # nested AND
    },
)

specs = st.lists(field_entries, min_size=0, max_size=3)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(spec=specs, rows=st.lists(records, min_size=1, max_size=8))
def test_compiled_column_matches_python_evaluator(spark, spec, rows):
    flt = Filter(spec)
    expected = [flt(r) for r in rows]

    data = [
        (idx, r["i"], r["d"], r["s"], r["b"], r["n"])
        for idx, r in enumerate(rows)
    ]
    df = spark.createDataFrame(data, SCHEMA)
    compiled = compile_filter(
        spec, schema=df.schema, null_as_false=True
    )
    got_rows = df.select("idx", compiled.alias("hit")).collect()
    got = [r["hit"] for r in sorted(got_rows, key=lambda r: r["idx"])]
    assert got == expected, f"spec={spec!r} rows={rows!r}"


@settings(max_examples=15, deadline=None)
@given(spec=specs, rows=st.lists(records, min_size=1, max_size=6))
def test_filter_context_equals_projection(spark, spec, rows):
    """df.filter(compiled) must keep exactly the null_as_false-true rows
    (NULL and False are interchangeable in a filter context)."""
    data = [
        (idx, r["i"], r["d"], r["s"], r["b"], r["n"])
        for idx, r in enumerate(rows)
    ]
    df = spark.createDataFrame(data, SCHEMA)
    kept = {
        r["idx"]
        for r in Filter(spec).apply(df).select("idx").collect()
    }
    flt = Filter(spec)
    expected = {i for i, r in enumerate(rows) if flt(r)}
    assert kept == expected


# -- json mode ---------------------------------------------------------------

json_records = st.fixed_dictionaries(
    {},
    optional={
        "num": st.integers(min_value=-5, max_value=5),
        "txt": st.sampled_from(["", "a", "ab", "abc", "zig"]),
        "dbl": st.sampled_from([-1.5, 0.0, 2.25]),
    },
)

json_field_entries = st.fixed_dictionaries(
    {},
    optional={
        "num": crit_list(
            st.one_of(
                st.integers(min_value=-5, max_value=5),
                numeric_chain(ints),
                exists_crit,
            )
        ),
        "txt": crit_list(
            st.one_of(
                st.sampled_from(["", "a", "ab", "abc", "zig"]),
                prefix_crit,
                exists_crit,
            )
        ),
        "dbl": crit_list(
            st.one_of(numeric_chain(doubles), exists_crit)
        ),
        "nope": crit_list(exists_crit),  # never-present key
    },
)

json_specs = st.lists(json_field_entries, min_size=0, max_size=2)


@settings(max_examples=25, deadline=None)
@given(spec=json_specs, rows=st.lists(json_records, min_size=1, max_size=6))
def test_json_mode_matches_python_evaluator(spark, spec, rows):
    """json-mode compilation (get_json_object + map_contains_key exists)
    must agree with dict-record evaluation for flat payloads without
    JSON nulls (the exactly-equivalent domain; null-vs-absent is only
    distinguishable through `exists`, which IS exact for top-level keys)."""
    import json as _json

    flt = Filter(spec)
    expected = [flt(r) for r in rows]
    data = [(i, _json.dumps(r)) for i, r in enumerate(rows)]
    df = spark.createDataFrame(data, "idx long, payload string")
    kept = {
        r["idx"]
        for r in df.filter(
            flt.column(mode="json", json_column="payload")
        ).select("idx").collect()
    }
    assert kept == {i for i, hit in enumerate(expected) if hit}, (
        f"spec={spec!r} rows={rows!r}"
    )
