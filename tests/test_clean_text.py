"""clean_text / nfc_column (r10: the crawl-text repair front door):
Spark ≡ DuckDB differential over an adversarial unicode corpus, NFC
parity with Python's unicodedata, idempotence, and the line-structure
contract downstream line_dedup/chunking depend on."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.text_analysis import (
    clean_text,
    nfc_column,
)

CASES = [
    (1, "plain ascii text"),
    (2, "combining: é and à compose"),  # é à via NFC
    (3, "crlf\r\nline\rends unicode seps"),
    (4, "zero​width‌join‍ers﻿bom"),
    (5, "nbsp and em-space　ideographic"),
    (6, "ctrl\x00chars\x07bell\x1besc\x7fdel"),
    (7, "  outer   spaces\tand\ttabs  "),
    (8, "trailing spaces at eol   \nnext line\t\nlast"),
    (9, "blank\n\n\n\n\nrun capped"),
    (10, ""),
    (11, None),
    (12, "tab\tkept single, \t run squeezed"),
    (13, "café already composed"),
    (14, "mixed é\r\n ​ x"),
    # the order-contract pin: ZWSP between base letter and combining
    # mark -- the invisibles must strip BEFORE NFC or composition is
    # blocked and clean_text is not idempotent
    (15, "split mark e\u200B\u0301 composes"),
]


def _duck_clean(vals):
    """The documented ANSI twin: nfc_normalize + the same replace
    chain, RE2 dialect (identical \\x{…} classes)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, x VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [list(v) for v in vals]
    )
    q = r"""
SELECT id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            nfc_normalize(
              regexp_replace(
                regexp_replace(x,
                  '\r\n|\r|\x{2028}|\x{2029}', chr(10), 'g'),
                '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]',
                '', 'g')),
            '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]',
            ' ', 'g'),
          '[ \t]{2,}', ' ', 'g'),
        '[ \t]+\n', chr(10), 'g'),
      '\n{3,}', chr(10) || chr(10), 'g'),
    '^\s+|\s+$', '', 'g') AS y
FROM t
"""
    return {r[0]: r[1] for r in con.execute(q).fetchall()}


def test_clean_text_matches_duckdb(spark):
    df = spark.createDataFrame(CASES, "id long, x string")
    got = {
        r["id"]: r["y"]
        for r in df.select(
            "id", clean_text("x").alias("y")
        ).collect()
    }
    want = _duck_clean(CASES)
    for i in want:
        assert got[i] == want[i], (i, repr(got[i]), repr(want[i]))


def test_nfc_matches_python(spark):
    df = spark.createDataFrame(CASES, "id long, x string")
    got = {
        r["id"]: r["y"]
        for r in df.select("id", nfc_column("x").alias("y")).collect()
    }
    for i, v in CASES:
        want = None if v is None else unicodedata.normalize("NFC", v)
        assert got[i] == want, i


def test_clean_text_specific_forms(spark):
    df = spark.createDataFrame(CASES, "id long, x string")
    got = {
        r["id"]: r["y"]
        for r in df.select(
            "id", clean_text("x").alias("y")
        ).collect()
    }
    assert got[2] == "combining: é and à compose"
    assert got[3] == "crlf\nline\nends\nunicode\nseps"
    assert got[4] == "zerowidthjoinersbom"
    assert got[5] == "nbsp and em-space ideographic"
    assert got[6] == "ctrlcharsbellescdel"
    assert got[7] == "outer spaces\tand\ttabs"
    assert got[8] == "trailing spaces at eol\nnext line\nlast"
    assert got[9] == "blank\n\nrun capped"
    assert got[10] == "" and got[11] is None
    assert got[13] == "café already composed"
    # ZWSP stripped first, THEN NFC composes e+U+0301 → é (one char)
    assert got[15] == "split mark é composes"


def test_clean_text_is_idempotent(spark):
    df = spark.createDataFrame(
        [c for c in CASES if c[1] is not None], "id long, x string"
    )
    once = df.select("id", clean_text("x").alias("y1"))
    twice = once.select(
        "id", "y1", clean_text("y1").alias("y2")
    )
    bad = twice.filter(F.col("y1") != F.col("y2")).collect()
    assert bad == [], bad


def test_clean_text_options(spark):
    df = spark.createDataFrame(
        [(1, "a  b\n\n\n\nc"), (2, "é")], "id long, x string"
    )
    # nfc off → combining char survives; squeeze off → run survives
    got = {
        r["id"]: r["y"]
        for r in df.select(
            "id",
            clean_text(
                "x", nfc=False, squeeze_spaces=False,
                max_blank_lines=None,
            ).alias("y"),
        ).collect()
    }
    assert got[1] == "a  b\n\n\n\nc"
    assert got[2] == "é"
    # max_blank_lines=0 → no blank lines at all
    got0 = df.select(
        clean_text("x", max_blank_lines=0).alias("y")
    ).collect()[0]["y"]
    assert got0 == "a b\nc"
    with pytest.raises(ValueError):
        clean_text("x", max_blank_lines=-1)


def test_clean_text_preserves_line_structure_for_line_dedup(spark):
    """The blank-line cap and EOL-trailing strip normalize lines
    without merging them — line_dedup sees the same logical lines."""
    from data_toolz_spark.operators.text_analysis import line_dedup

    rows = [
        (1, "keep one\r\nBANNER  \n\n\n\nbody a"),
        (2, "keep two\nBANNER x\nbody b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = df.select(
        "doc_id", clean_text("text").alias("text")
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup(
            cleaned, id_col="doc_id", text_col="text", max_doc_freq=2
        ).collect()
    }
    # all lines unique across docs after cleaning → nothing dropped,
    # and the cleaned newline structure survived the round trip
    assert out[1] == "keep one\nBANNER\n\nbody a"
    assert out[2] == "keep two\nBANNER x\nbody b"
