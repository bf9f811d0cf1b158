"""Converged per-entry timing for the r12 optimization round.

Usage: python tools/r12_time_entry.py <entry> [<entry> ...] [--n=K]

Times each registry qid / bench EXTRAS entry K times (default 5) in ONE
warmed session (bench methodology: noop sink for DataFrame results) and
prints min/median/all — the sweep-to-sweep noise on this host is ~±17%
(BENCH_DETAIL_r12 vs r12b), so single isolated runs cannot resolve
per-entry changes; converged same-session repeats can.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    n = 5
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        else:
            names.append(a)
    # match the bench session EXACTLY (master local[CPUS], shuffle
    # partitions = CPUS) — a first cut of this tool left shuffle
    # partitions at the 200 default, which schedules 6x the tasks the
    # bench ever runs and made its numbers incomparable to the sweeps
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="r12_time_entry",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench as benchmod

    # resolve names EXACTLY like the sweep: registry qids, pinned
    # legacy/series definitions, extras, then the split/build forms
    # (the sweep times sim_topk_ivf as search-only against the
    # prebuilt index; "<qid>:full" forces the unsplit registry fn)
    sources: dict[str, object] = {}
    sources.update(entrymod.queries())
    for name, fn in benchmod.DEFN_PIN.items():
        sources[name] = fn
    for name, fn in benchmod.LEGACY.items():
        sources.setdefault(name, fn)
    for name, fn in benchmod.EXTRAS.items():
        sources.setdefault(name, fn)
    for qid, build_name, build_fn in benchmod.BENCH_BUILDS:
        sources[build_name] = build_fn
    for qid, fn in benchmod.BENCH_SPLIT.items():
        if any(n == qid or n.startswith(qid + ":") for n in names):
            sources[qid + ":full"] = sources.get(qid, entrymod.queries()[qid])
            build = next(
                b for q, _, b in benchmod.BENCH_BUILDS if q == qid
            )
            build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            sources[qid] = fn
    # one warm-up pass over the documents table so the page cache and
    # scan codegen are hot before any timed repeat
    entrymod.load(spark, SF_DIR, "documents").count()
    out = {}
    for name in names:
        fn = sources[name]
        times = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.monotonic()
            r = fn(spark, SF_DIR)
            if hasattr(r, "write"):
                r.write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
            # the bench's between-repeat hygiene (outside the timer):
            # release operator persists + clear the SQL cache so one
            # repeat's cached blocks never feed the next — without
            # this, any query using cache.track would time its 2nd+
            # repeats against a warm InMemoryTableScan
            from data_toolz_spark.cache import clear_session_caches

            clear_session_caches(spark)
        out[name] = {
            "min": min(times),
            "median": round(statistics.median(times), 3),
            "all": times,
        }
        print(json.dumps({name: out[name]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
