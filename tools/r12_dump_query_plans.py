"""Capture .explain("formatted") for every declared query (and the
bench EXTRAS) into plans/r12/<name>_<tag>.txt.

Usage: python tools/r12_dump_query_plans.py <tag> [name ...]

<tag> is "before" or "after"; with no names, dumps every registry qid
plus every bench EXTRAS entry.  AQE stays ON (runtime default) — the
formatted output is the initial plan (isFinalPlan=false), which is the
shape the optimization round's claims are about (Exchange count, join
strategy, PushedFilters, ReadSchema, Python-eval nodes).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r12",
)


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        print("usage: r12_dump_query_plans.py before|after [name ...]")
        return 2
    tag = sys.argv[1]
    only = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(
        app_name="r12_plan_dump",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(
                prefix="dts-plandump-warehouse-"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench as benchmod

    sources: dict[str, object] = {}
    sources.update(entrymod.queries())
    for name, fn in benchmod.EXTRAS.items():
        sources.setdefault(name, fn)
    names = only or list(sources)
    for name in names:
        fn = sources[name]
        try:
            df = fn(spark, SF_DIR)
            text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
