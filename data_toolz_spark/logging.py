"""JSON structured logging + instrumentation decorator.

Parity with the reference's ``JsonLogger`` (datatoolz/logging.py:19-105):
same JSON envelope ``{logger: {application, environment}, level,
timestamp, message}`` on stdout with ``extra`` present ONLY when
non-empty (logging.py:47-48), ``info(msg, **custom)`` /
``error(msg, **custom)`` kwargs surface (logging.py:51-65), and a
``decorate(msg, duration=True, memory=True, **custom)`` instrumentation
decorator whose callable customs are applied to the wrapped function's
result (logging.py:67-105; reference key names ``duration`` and
``memory: {current, peak}``).

Documented extensions beyond the reference (SURVEY §2.6/L3):

* ``extra=`` also accepts a whole mapping (merged under ``**custom``).
* ``decorate`` may be used bare (``@logger.decorate``) and adds a
  ``spark`` block from the SparkContext status tracker when a session
  is live — driver-side ``tracemalloc`` cannot see JVM executors, so
  executor-side aggregates are the distributed memory/work signal.
* failures are logged at ERROR with the exception attached and
  re-raised (the reference logs nothing on failure).
"""

from __future__ import annotations

import functools
import json
import logging as _pylogging
import sys
import time
import tracemalloc
from typing import Any, Callable, Mapping

INFO = "info"
DEBUG = "debug"
WARNING = "warning"
ERROR = "error"


class JsonLogger:
    """Structured JSON logger writing single-line records to stdout.

    >>> logger = JsonLogger(name="my-app", env="dev")
    >>> logger.info("hello", rows=42)
    {"logger": {"application": "my-app", "environment": "dev"}, ...}
    """

    def __init__(
        self,
        name: str = "default",
        env: str = "dev",
        stream=None,
    ) -> None:
        self.name = name
        self.env = env
        self._logger = _pylogging.getLogger(f"data_toolz_spark.{name}.{env}")
        # reset handlers so repeated construction never duplicates output
        # (reference behavior, logging.py:27-28)
        self._logger.handlers.clear()
        handler = _pylogging.StreamHandler(stream or sys.stdout)
        handler.setFormatter(_pylogging.Formatter("%(message)s"))
        self._logger.addHandler(handler)
        self._logger.setLevel(_pylogging.INFO)
        self._logger.propagate = False

    def _emit(self, level: str, message: Any, extra: Mapping | None) -> None:
        record = {
            "logger": {"application": self.name, "environment": self.env},
            "level": level,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
            "message": message,
        }
        # reference envelope: "extra" is OMITTED when empty
        # (logging.py:47-48) — consumers key on its presence
        if extra:
            record["extra"] = dict(extra)
        line = json.dumps(record, default=str)
        if level == ERROR:
            self._logger.error(line)
        else:
            self._logger.info(line)

    def info(
        self, message: Any, extra: Mapping | None = None, **custom: Any
    ) -> None:
        self._emit(INFO, message, {**dict(extra or {}), **custom})

    def error(
        self, message: Any, extra: Mapping | None = None, **custom: Any
    ) -> None:
        self._emit(ERROR, message, {**dict(extra or {}), **custom})

    # ------------------------------------------------------------------

    def decorate(
        self,
        function: Callable | str | None = None,
        *,
        msg: str | None = None,
        duration: bool = True,
        memory: bool = True,
        extras: Mapping | Callable[[Any], Mapping] | None = None,
        spark_metrics: bool = True,
        **custom: Any,
    ) -> Callable:
        """Instrument a function: duration, memory, Spark stats, customs.

        Reference-compatible forms (logging.py:67-105)::

            @logger.decorate("loading data")               # static msg
            @logger.decorate("n", rows=lambda df: df.count())

        callable customs run on the wrapped function's result; statics
        pass through.  Extensions: bare ``@logger.decorate`` (message
        defaults to ``"<name> finished"``), ``extras=`` whole-mapping
        form, and a ``spark`` status-tracker block when a session is
        live (``spark_metrics``).
        """
        if isinstance(function, str) and msg is None:
            function, msg = None, function

        def wrap(func: Callable) -> Callable:
            @functools.wraps(func)
            def inner(*args: Any, **kwargs: Any) -> Any:
                if memory:
                    tracemalloc.start()
                started = time.perf_counter()
                error: BaseException | None = None
                result = None
                try:
                    result = func(*args, **kwargs)
                    return result
                except BaseException as exc:  # re-raised below
                    error = exc
                    raise
                finally:
                    elapsed = time.perf_counter() - started
                    log: dict[str, Any] = {"function": func.__name__}
                    if memory:
                        current, peak = tracemalloc.get_traced_memory()
                        tracemalloc.stop()
                        log["memory"] = {"current": current, "peak": peak}
                    if duration:
                        log["duration"] = elapsed
                    if spark_metrics:
                        stats = _spark_status_snapshot()
                        if stats:
                            log["spark"] = stats
                    if error is None:
                        for name, call_or_value in custom.items():
                            log[name] = (
                                call_or_value(result)
                                if callable(call_or_value)
                                else call_or_value
                            )
                        if extras is not None:
                            log.update(
                                extras(result) if callable(extras) else extras
                            )
                        self.info(msg or f"{func.__name__} finished", **log)
                    else:
                        log["error"] = repr(error)
                        self.error(msg or f"{func.__name__} failed", **log)

            return inner

        if function is not None:
            return wrap(function)
        return wrap


def _spark_status_snapshot() -> dict[str, Any] | None:
    """Executor/job aggregates from an active session's status tracker."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return None
        tracker = spark.sparkContext.statusTracker()
        return {
            "active_jobs": len(tracker.getActiveJobsIds()),
            "active_stages": len(tracker.getActiveStageIds()),
            "default_parallelism": spark.sparkContext.defaultParallelism,
        }
    except Exception:  # pragma: no cover - defensive, logging must not fail
        return None


__all__ = ["JsonLogger", "INFO", "DEBUG", "WARNING", "ERROR"]
