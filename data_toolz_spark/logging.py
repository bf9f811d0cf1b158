"""JSON structured logging + instrumentation decorator.

Parity with the reference's ``JsonLogger`` (datatoolz/logging.py:19-105):
same JSON envelope ``{logger: {application, environment}, level,
timestamp, message, extra}`` on stdout, ``info``/``error`` methods, and
a ``decorate`` wrapper capturing wall time and memory.

Spark adaptation (SURVEY §2.6/L3): driver-side ``tracemalloc`` cannot
see JVM executors, so the decorator additionally snapshots Spark
executor/stage aggregates from the SparkContext status tracker when a
session is active — rows and task metrics live JVM-side where the work
actually happens.
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
ERROR = "error"


class JsonLogger:
    """Structured JSON logger writing single-line records to stdout.

    >>> logger = JsonLogger(name="my-app", env="dev")
    >>> logger.info("hello", extra={"rows": 42})
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
        # (reference behavior, logging.py:30-36)
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
            "extra": dict(extra or {}),
        }
        line = json.dumps(record, default=str)
        if level == ERROR:
            self._logger.error(line)
        else:
            self._logger.info(line)

    def info(self, message: Any, extra: Mapping | None = None) -> None:
        self._emit(INFO, message, extra)

    def error(self, message: Any, extra: Mapping | None = None) -> None:
        self._emit(ERROR, message, extra)

    # ------------------------------------------------------------------

    def decorate(
        self,
        function: Callable | None = None,
        *,
        extras: Mapping | Callable[[Any], Mapping] | None = None,
        spark_metrics: bool = True,
    ) -> Callable:
        """Instrument a function: wall time, driver memory, Spark stats.

        ``extras`` may be a static mapping or a callable applied to the
        wrapped function's result (reference logging.py:81-99).  When a
        SparkSession is live and ``spark_metrics`` is set, executor
        aggregates from the status tracker are attached — the
        distributed replacement for tracemalloc, which only sees the
        driver.
        """

        def wrap(func: Callable) -> Callable:
            @functools.wraps(func)
            def inner(*args: Any, **kwargs: Any) -> Any:
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
                    _, peak = tracemalloc.get_traced_memory()
                    tracemalloc.stop()
                    extra: dict[str, Any] = {
                        "function": func.__name__,
                        "wall_time_sec": round(elapsed, 6),
                        "driver_peak_mem_bytes": peak,
                    }
                    if spark_metrics:
                        stats = _spark_status_snapshot()
                        if stats:
                            extra["spark"] = stats
                    if extras is not None and error is None:
                        extra.update(
                            extras(result) if callable(extras) else extras
                        )
                    if error is None:
                        self.info(f"{func.__name__} finished", extra=extra)
                    else:
                        extra["error"] = repr(error)
                        self.error(f"{func.__name__} failed", extra=extra)

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


__all__ = ["JsonLogger", "INFO", "ERROR"]
