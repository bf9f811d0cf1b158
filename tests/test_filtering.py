"""Filter DSL tests — behavior matrices in the reference's style
(SURVEY §5 pattern 2: entries × filter × expected booleans), evaluated
BOTH row-at-a-time (parity path) and compiled-to-Column (Spark path).

Matrices adapted from the semantics verified in
/root/reference/tests/test_filtering.py (see SURVEY.md §2.4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_toolz_spark.plans.filtering import Filter, compile_filter

ENTRIES = [
    {"id": 0, "field": "value", "other": "x"},
    {"id": 1, "field": "value two", "other": "x"},
    {"id": 2, "field": None, "other": "x"},
    {"id": 3, "field": 1, "other": "x"},
    {"id": 4, "field": 25.5, "other": "x"},
    {"id": 5, "other": "x"},  # field absent
]


def _spark_eval(spark, filters, entries=None):
    """Compile the spec and return the set of matching ids."""
    entries = entries if entries is not None else ENTRIES
    # normalize: every entry gets the union of keys; absent → no column,
    # so absent-field matrices use their own frame built per-case
    keys = sorted({k for e in entries for k in e})
    typed = [
        Row(**{k: e.get(k) for k in keys}) for e in entries
    ]
    df = spark.createDataFrame(typed)
    pred = compile_filter(filters, schema=df.schema)
    return {r.id for r in df.filter(pred).select("id").collect()}


def _py_eval(filters, entries=None):
    entries = entries if entries is not None else ENTRIES
    flt = Filter(filters)
    return {e["id"] for e in entries if flt(e)}


class TestRowAtATimeParity:
    """Pure-Python evaluator matches reference semantics exactly."""

    def test_empty_filter_matches_everything(self):
        assert _py_eval(None) == {0, 1, 2, 3, 4, 5}
        assert _py_eval([]) == {0, 1, 2, 3, 4, 5}

    def test_equality(self):
        assert _py_eval([{"field": ["value"]}]) == {0}

    def test_equality_none_matches_present_null_only(self):
        # present-but-None matches; absent does NOT (filtering.py:33-34)
        assert _py_eval([{"field": [None]}]) == {2}

    def test_criteria_list_is_or(self):
        assert _py_eval([{"field": ["value", "value two"]}]) == {0, 1}

    def test_anything_but(self):
        assert _py_eval([{"field": [{"anything-but": ["value"]}]}]) == {1, 2, 3, 4}

    def test_anything_but_with_none_in_list(self):
        assert _py_eval([{"field": [{"anything-but": ["value", None]}]}]) == {
            1,
            3,
            4,
        }

    def test_anything_but_requires_list(self):
        with pytest.raises(ValueError):
            _py_eval([{"field": [{"anything-but": "value"}]}])

    NUMERIC_ENTRIES = [
        {"id": 0, "field": 0},
        {"id": 1, "field": 1},
        {"id": 2, "field": 25.5},
        {"id": 3},  # absent
    ]

    def test_numeric_range(self):
        assert _py_eval(
            [{"field": [{"numeric": [">", 0, "<=", 25.5]}]}], self.NUMERIC_ENTRIES
        ) == {1, 2}

    def test_numeric_on_non_numeric_value_raises(self):
        # reference parity: Python comparison TypeError propagates
        # (filtering.py:55 applies > to the raw value)
        with pytest.raises(TypeError):
            _py_eval([{"field": [{"numeric": [">", 0]}]}])

    def test_numeric_odd_chain_raises(self):
        with pytest.raises(ValueError):
            _py_eval(
                [{"field": [{"numeric": [">", 0, "<="]}]}], self.NUMERIC_ENTRIES
            )

    def test_exists(self):
        assert _py_eval([{"field": [{"exists": True}]}]) == {0, 1, 2, 3, 4}
        assert _py_eval([{"field": [{"exists": False}]}]) == {5}

    def test_prefix(self):
        assert _py_eval([{"field": [{"prefix": "value"}]}]) == {0, 1}

    def test_prefix_requires_string_reference(self):
        with pytest.raises(ValueError):
            _py_eval([{"field": [{"prefix": 1}]}])

    def test_prefix_non_string_value_never_matches(self):
        assert _py_eval([{"field": [{"prefix": "1"}]}]) == set()

    def test_top_level_or(self):
        spec = [{"field": ["value"]}, {"field": [1]}]
        assert _py_eval(spec) == {0, 3}

    def test_fields_are_anded(self):
        spec = [{"field": ["value"], "other": ["x"]}]
        assert _py_eval(spec) == {0}
        spec = [{"field": ["value"], "other": ["y"]}]
        assert _py_eval(spec) == set()

    def test_nested_filter(self):
        entries = [
            {"id": 0, "outer": {"inner": "a"}},
            {"id": 1, "outer": {"inner": "b"}},
            {"id": 2, "outer": {}},
        ]
        spec = [{"outer": {"inner": ["a"]}}]
        assert _py_eval(spec, entries) == {0}
        spec = [{"outer": {"inner": [{"exists": False}]}}]
        assert _py_eval(spec, entries) == {2}

    def test_unknown_criterium_raises_type_error(self):
        with pytest.raises(TypeError):
            _py_eval([{"field": [{"bogus": 1}]}])
        with pytest.raises(TypeError):
            _py_eval([{"field": [["nested-list"]]}])

    def test_bool_int_equality_quirk(self):
        # Python: 1 == True (SURVEY §7.4.8)
        entries = [{"id": 0, "flag": True}, {"id": 1, "flag": False}]
        assert _py_eval([{"flag": [1]}], entries) == {0}


@pytest.mark.usefixtures("spark")
class TestCompiledColumn:
    """Compiled Column semantics agree with the row-at-a-time path."""

    STRING_ENTRIES = [
        {"id": 0, "field": "value", "other": "x"},
        {"id": 1, "field": "value two", "other": "x"},
        {"id": 2, "field": None, "other": "x"},
        {"id": 3, "field": "zzz", "other": "x"},
    ]
    NUM_ENTRIES = [
        {"id": 0, "num": 0.0},
        {"id": 1, "num": 1.0},
        {"id": 2, "num": 25.5},
        {"id": 3, "num": None},
    ]

    @pytest.mark.parametrize(
        "spec",
        [
            [{"field": ["value"]}],
            [{"field": ["value", "value two"]}],
            [{"field": [None]}],
            [{"field": [{"anything-but": ["value"]}]}],
            [{"field": [{"anything-but": ["value", None]}]}],
            [{"field": [{"prefix": "value"}]}],
            [{"field": [{"exists": True}]}],
            [{"field": [{"exists": False}]}],
            [{"field": ["value"], "other": ["x"]}],
            [{"field": ["value"]}, {"field": ["zzz"]}],
        ],
    )
    def test_string_matrix_agrees(self, spark, spec):
        assert _spark_eval(spark, spec, self.STRING_ENTRIES) == _py_eval(
            spec, self.STRING_ENTRIES
        )

    @pytest.mark.parametrize(
        "spec",
        [
            [{"num": [{"numeric": [">", 0]}]}],
            [{"num": [{"numeric": [">", 0, "<=", 25.5]}]}],
            [{"num": [{"numeric": ["=", 1]}]}],
        ],
    )
    def test_numeric_matrix_agrees(self, spark, spec):
        # reference raises TypeError on a present-None value compared
        # numerically (filtering.py:55); the relational encoding has no
        # crash path, so null rows are excluded from the parity matrix
        non_null = [e for e in self.NUM_ENTRIES if e["num"] is not None]
        assert _spark_eval(spark, spec, non_null) == _py_eval(spec, non_null)

    @pytest.mark.parametrize(
        "spec",
        [
            [{"num": [0.0, 25.5]}],
            [{"num": [None]}],
            [{"num": [{"anything-but": [0.0]}]}],
        ],
    )
    def test_numeric_null_matrix_agrees(self, spark, spec):
        assert _spark_eval(spark, spec, self.NUM_ENTRIES) == _py_eval(
            spec, self.NUM_ENTRIES
        )

    def test_numeric_null_compiles_to_false(self, spark):
        # compiled delta (SURVEY §7.4.1): NULL input → predicate False,
        # where the row-at-a-time reference raises TypeError
        got = _spark_eval(
            spark, [{"num": [{"numeric": [">", 0]}]}], self.NUM_ENTRIES
        )
        assert got == {1, 2}

    def test_absent_column_is_compile_time_constant(self, spark):
        df = spark.createDataFrame([Row(id=0, field="x")])
        # absent path + exists:False → matches everything
        pred = compile_filter([{"ghost": [{"exists": False}]}], schema=df.schema)
        assert df.filter(pred).count() == 1
        # absent path + any value matcher → matches nothing
        pred = compile_filter([{"ghost": ["x"]}], schema=df.schema)
        assert df.filter(pred).count() == 0

    def test_nested_struct_path(self, spark):
        df = spark.createDataFrame(
            [
                Row(id=0, outer=Row(inner="a")),
                Row(id=1, outer=Row(inner="b")),
            ]
        )
        pred = compile_filter([{"outer": {"inner": ["a"]}}], schema=df.schema)
        assert [r.id for r in df.filter(pred).collect()] == [0]

    def test_json_mode(self, spark, events):
        flt = Filter([{"k": [{"numeric": [">=", 50]}]}])
        got = events.filter(
            flt.column(mode="json", json_column="props")
        ).count()
        want = events.filter(
            F.get_json_object("props", "$.k").cast("double") >= 50
        ).count()
        assert got == want > 0

    def test_filter_apply_facade(self, spark, events):
        flt = Filter([{"event_type": ["click"]}])
        assert (
            flt.apply(events).count()
            == events.filter(F.col("event_type") == "click").count()
        )

    def test_filter_pushdown_reaches_scan(self, spark, sf_dir):
        """Compiled equality/range predicates appear as PushedFilters."""
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pred = compile_filter(
            [
                {
                    "l_returnflag": ["R"],
                    "l_quantity": [{"numeric": [">", 10]}],
                }
            ],
            schema=df.schema,
        )
        plan = df.filter(pred)._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        assert "l_returnflag" in plan.split("PushedFilters")[1][:300]


class TestJsonExistsExact:
    """JSON `exists` must distinguish a key holding JSON null from an
    absent key (reference semantics: dict membership, filtering.py:64-65;
    resolved delta SURVEY §7.4.2)."""

    def test_null_valued_key_exists(self, spark):
        from data_toolz_spark.plans.filtering import Filter

        df = spark.createDataFrame(
            [
                (1, '{"k": null}'),   # key present, JSON null
                (2, '{"k": 5}'),      # key present, value
                (3, '{"x": 1}'),      # key absent
                (4, None),            # payload NULL → no keys
            ],
            "id long, props string",
        )
        has_k = Filter([{"k": [{"exists": True}]}])
        got = {
            r["id"] for r in df.filter(
                has_k.column(mode="json", json_column="props")
            ).collect()
        }
        assert got == {1, 2}

        no_k = Filter([{"k": [{"exists": False}]}])
        got = {
            r["id"] for r in df.filter(
                no_k.column(mode="json", json_column="props")
            ).collect()
        }
        assert got == {3, 4}

    def test_python_evaluator_agrees(self):
        from data_toolz_spark.plans.filtering import Filter

        has_k = Filter([{"k": [{"exists": True}]}])
        assert has_k({"k": None}) is True
        assert has_k({"k": 5}) is True
        assert has_k({"x": 1}) is False
