"""JsonLogger parity tests — same patterns as the reference suite
(reference tests/test_logging.py: capture stdout, parse the JSON
envelope, bracket the timestamp, check decorator extras)."""

from __future__ import annotations

import json
import time

import pytest

from data_toolz_spark.logging import JsonLogger


def _last_record(capsys) -> dict:
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    return json.loads(lines[-1])


def test_envelope_shape(capsys):
    logger = JsonLogger(name="my-app", env="prod")
    logger.info("hello", extra={"rows": 42})
    rec = _last_record(capsys)
    assert rec["logger"] == {"application": "my-app", "environment": "prod"}
    assert rec["level"] == "info"
    assert rec["message"] == "hello"
    assert rec["extra"] == {"rows": 42}


def test_timestamp_bracketed(capsys):
    before = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())
    logger = JsonLogger()
    logger.error("boom")
    after = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())
    rec = _last_record(capsys)
    assert before <= rec["timestamp"] <= after
    assert rec["level"] == "error"


def test_no_duplicate_handlers(capsys):
    # repeated construction must not duplicate output lines
    for _ in range(3):
        logger = JsonLogger(name="dup", env="dev")
    logger.info("once")
    out = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(out) == 1


def test_decorator_success_extras(capsys):
    logger = JsonLogger(name="deco")

    @logger.decorate(extras=lambda result: {"result_len": len(result)})
    def work():
        return [1, 2, 3]

    assert work() == [1, 2, 3]
    rec = _last_record(capsys)
    assert rec["level"] == "info"
    assert rec["message"] == "work finished"
    assert rec["extra"]["function"] == "work"
    assert rec["extra"]["result_len"] == 3
    assert rec["extra"]["duration"] >= 0
    assert rec["extra"]["memory"]["peak"] >= 0


def test_decorator_static_extras(capsys):
    logger = JsonLogger(name="deco2")

    @logger.decorate(extras={"stage": "ingest"})
    def work():
        return 7

    work()
    assert _last_record(capsys)["extra"]["stage"] == "ingest"


def test_decorator_error_path(capsys):
    logger = JsonLogger(name="deco3")

    @logger.decorate
    def explode():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        explode()
    rec = _last_record(capsys)
    assert rec["level"] == "error"
    assert rec["message"] == "explode failed"
    assert "ValueError" in rec["extra"]["error"]


def test_reference_kwargs_surface(capsys):
    """info(msg, **custom) and empty-extra omission (reference
    logging.py:47-65): the envelope has NO "extra" key when nothing
    custom is passed."""
    logger = JsonLogger(name="ref", env="dev")
    logger.info("bare")
    rec = _last_record(capsys)
    assert "extra" not in rec
    logger.info("kw", rows=3, stage="load")
    rec = _last_record(capsys)
    assert rec["extra"] == {"rows": 3, "stage": "load"}


def test_reference_decorate_signature(capsys):
    """decorate(msg, duration=, memory=, **custom) with callable
    customs applied to the result (reference logging.py:67-105)."""
    logger = JsonLogger(name="ref2")

    @logger.decorate("loading", rows=lambda result: len(result), kind="x")
    def work():
        return [1, 2]

    work()
    rec = _last_record(capsys)
    assert rec["message"] == "loading"
    assert rec["extra"]["rows"] == 2
    assert rec["extra"]["kind"] == "x"
    assert rec["extra"]["memory"].keys() == {"current", "peak"}
    assert rec["extra"]["duration"] >= 0

    @logger.decorate("quiet", duration=False, memory=False)
    def fast():
        return None

    fast()
    rec = _last_record(capsys)
    assert "duration" not in rec["extra"]
    assert "memory" not in rec["extra"]


def test_decorator_attaches_spark_metrics(spark, capsys):
    logger = JsonLogger(name="deco4")

    @logger.decorate
    def count_rows():
        return spark.range(100).count()

    assert count_rows() == 100
    rec = _last_record(capsys)
    assert "spark" in rec["extra"]
    assert rec["extra"]["spark"]["default_parallelism"] >= 1
