"""strip_html: tag/script/comment removal, entity decode order, block
newlines, whitespace normalization, plain-text idempotence, pure-codegen
plan."""

from __future__ import annotations

from data_toolz_spark.operators.text_analysis import strip_html


def _clean(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    return strip_html(df, **kw).collect()[0]["clean_text"]


def test_full_document(spark):
    html = (
        "<!DOCTYPE html><html><HEAD>"
        "<script type='text/js'>var x = '<div>fake</div>';</script>"
        "<style>p { color: red; }</style></HEAD><body>\n"
        "<h1>Title</h1>\n"
        "<!-- a comment with <b>tags</b> -->\n"
        "<p>first &amp; second</p>"
        "<ul><li>A&nbsp;1</li><li>B &lt;tag&gt;</li></ul>"
        "</body></html>"
    )
    assert _clean(spark, html) == "Title\nfirst & second\nA 1\nB <tag>"


def test_script_payload_with_nested_tags_vanishes(spark):
    assert (
        _clean(spark, "a <SCRIPT>if (x<1) { d('<p>hi</p>') }</sCrIpT> b")
        == "a b"
    )


def test_entity_order_no_double_decode(spark):
    # '&amp;lt;' names the 4-char string '&lt;', NOT '<'
    assert _clean(spark, "x &amp;lt; y") == "x &lt; y"
    assert _clean(spark, "q&quot;e&#39;r") == "q\"e'r"


def test_block_newlines_toggle(spark):
    html = "<p>one</p><p>two</p><br>three"
    assert _clean(spark, html) == "one\ntwo\nthree"
    assert _clean(spark, html, block_newlines=False) == "one two three"


def test_br_variants(spark):
    assert _clean(spark, "a<br>b<br/>c<BR />d") == "a\nb\nc\nd"


def test_plain_text_is_normalized_only(spark):
    assert _clean(spark, "  plain   text \n\n  here  ") == (
        "plain text\nhere"
    )


def test_unclosed_script_survives_as_text_contract(spark):
    # documented heuristic contract: no matching </script> → the open
    # tag strips as a generic tag, payload survives
    assert _clean(spark, "a <script>var x = 1 b") == "a var x = 1 b"


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], ["id", "text"])
    plan = (
        strip_html(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
