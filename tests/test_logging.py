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
    assert rec["extra"]["wall_time_sec"] >= 0
    assert rec["extra"]["driver_peak_mem_bytes"] >= 0


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


def test_decorator_attaches_spark_metrics(spark, capsys):
    logger = JsonLogger(name="deco4")

    @logger.decorate
    def count_rows():
        return spark.range(100).count()

    assert count_rows() == 100
    rec = _last_record(capsys)
    assert "spark" in rec["extra"]
    assert rec["extra"]["spark"]["default_parallelism"] >= 1
