"""PII detection/redaction: targeted cases + a randomized differential
vs a Python reference (regex semantics are shared between Java and
Python's `re` for these portable patterns; Luhn is reimplemented
independently)."""

from __future__ import annotations

import random
import re

from data_toolz_spark.operators.text_analysis import (
    PII_PATTERNS,
    pii_features,
    redact_pii,
)


def _luhn_ok(cand: str) -> bool:
    ds = [int(ch) for ch in cand if ch.isdigit()]
    if not 13 <= len(ds) <= 16:
        return False
    total = 0
    for i, d in enumerate(reversed(ds)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _py_redact(text: str) -> str:
    for cand in re.findall(PII_PATTERNS["card"], text):
        if _luhn_ok(cand):
            # position-anchored, mirroring the operator: the same
            # digit string embedded in a longer run elsewhere is NOT
            # a card occurrence and must survive (ADVICE r6)
            text = re.sub(
                r"(?<![\d-])" + re.escape(cand) + r"(?![\d-])",
                "<CARD>",
                text,
            )
    text = re.sub(PII_PATTERNS["ssn"], "<SSN>", text)
    text = re.sub(PII_PATTERNS["phone"], "<PHONE>", text)
    text = re.sub(PII_PATTERNS["ipv4"], "<IP>", text)
    return text


CASES = [
    (1, "call me at 415-555-0172 or (212) 555-0199 x3"),
    (2, "server at 192.168.001.001 answered"),
    (3, "ssn 078-05-1120 on file"),
    # 4242... is Luhn-valid; the order id below is not
    (4, "card 4242 4242 4242 4242 charged; order 1234-5678-9012-3456"),
    (5, "luhn-invalid 4242 4242 4242 4243 stays"),
    (6, "version 1.2.3.4 of the lib"),  # dotted quad — redacted by design
    (7, "no pii here at all"),
    (8, "pi to 15 places 3.141592653589793"),  # decimal, not a card
    (9, "ts 1699999999999999 is 16 digits"),  # Luhn-gated
    (10, "565-55-5555 and 10.0.0.1 and 650.555.1234"),
    # the SAME Luhn-valid digit string, once as a real card candidate
    # and once embedded in a longer digit run where it never matched —
    # the embedded serial must survive verbatim (ADVICE r6)
    (11, "card 4242424242424242 ok; serial 994242424242424242 intact"),
]


def test_redaction_cases(spark):
    df = spark.createDataFrame(CASES, ["id", "text"])
    got = {
        r["id"]: r["text"]
        for r in redact_pii(df).collect()
    }
    for i, raw in CASES:
        assert got[i] == _py_redact(raw), (i, raw, got[i])
    # the load-bearing specifics, pinned directly:
    assert "<PHONE>" in got[1] and got[1].count("<PHONE>") == 2
    assert got[2] == "server at <IP> answered"
    assert got[3] == "ssn <SSN> on file"
    assert "<CARD>" in got[4] and "1234-5678-9012-3456" in got[4]
    assert "4243" in got[5]  # luhn-invalid survives
    assert got[7] == "no pii here at all"
    assert "3.141592653589793" in got[8]
    assert got[11] == "card <CARD> ok; serial 994242424242424242 intact"


def test_counts_match_python(spark):
    df = spark.createDataFrame(CASES, ["id", "text"])
    got = {
        r["id"]: (r["n_phones"], r["n_ipv4"], r["n_ssn"], r["n_cards"])
        for r in pii_features(df).collect()
    }
    for i, raw in CASES:
        want = (
            len(re.findall(PII_PATTERNS["phone"], raw)),
            len(re.findall(PII_PATTERNS["ipv4"], raw)),
            len(re.findall(PII_PATTERNS["ssn"], raw)),
            sum(
                _luhn_ok(c)
                for c in re.findall(PII_PATTERNS["card"], raw)
            ),
        )
        assert got[i] == want, (i, raw, got[i], want)


def test_randomized_differential(spark):
    rng = random.Random(17)
    frags = [
        "hello world", "415-555-0172", "(212) 555-0199", "10.0.0.1",
        "078-05-1120", "4242 4242 4242 4242", "4242424242424243",
        "order 99", "v1.2.3.4", "3.14159", "+1 650-555-2222",
        "a@b.co", "1699999999", "12 34", "",
    ]
    rows = [
        (i, " ".join(rng.choices(frags, k=rng.randint(1, 8))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r["text"] for r in redact_pii(df).collect()}
    for i, raw in rows:
        assert got[i] == _py_redact(raw), (i, raw, got[i])


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(CASES, ["id", "text"])
    plan = (
        redact_pii(pii_features(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
