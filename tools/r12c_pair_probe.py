"""Converged A/B for the driver-held pair tables (r12 optimization
round, resumed session).

Three interleaved same-session comparisons, each asserting merge-list
bit-parity between arms before reporting times (min/median of K):

* W1 — ``wordpiece_train`` (word table, 12 merges): driver arm
  (default ``_DRIVER_PAIR_CAP``) vs distributed arm (cap forced 0).
  The §7 bdfbd7d before/after evidence.
* W2 — ``bpe_train`` delta mode (word-trigram table, 128 merges,
  batch 64): driver vs distributed arms, same forcing.
* W3 — ``bpe_train`` on the SMALL word-bigram table (256 merges,
  batch 64): ``pair_mode='recount'`` (today's auto pick below 16,384
  units) vs ``pair_mode='delta'`` (driver table) — re-measuring the
  auto crossover now that the delta table costs zero Spark work per
  round below the cap.

Usage: python tools/r12c_pair_probe.py [--n=K]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_toolz_spark.operators import bpe as bpemod
from data_toolz_spark.operators.bpe import (
    bpe_bigram_unit_table,
    bpe_ngram_unit_table,
    bpe_train,
    bpe_word_table,
)
from data_toolz_spark.operators.wordpiece import wordpiece_train
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="r12c_pair_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = entrymod.load(spark, SF_DIR, "documents")
    docs.count()  # warm scan

    cap_default = bpemod._DRIVER_PAIR_CAP
    # the auto-LOCAL gate (landed after this probe's first run) would
    # otherwise take W1's whole loop driver-local; force it off so the
    # probe keeps comparing the driver-DICT arm vs the distributed arm
    bpemod._LOCAL_UNIT_CAP = 0

    def run(tag, fn, force_distributed):
        bpemod._DRIVER_PAIR_CAP = 0 if force_distributed else cap_default
        stats: dict = {}
        t0 = time.perf_counter()
        merges = fn(stats)
        took = round(time.perf_counter() - t0, 3)
        bpemod._DRIVER_PAIR_CAP = cap_default
        return merges, took, stats.get("pair_table"), stats.get("rounds")

    workloads = {
        "W1_wordpiece12": lambda st: wordpiece_train(
            bpe_word_table(docs), n_merges=12, min_count=2, stats=st
        ),
        "W2_bpe_delta128": lambda st: bpe_train(
            bpe_ngram_unit_table(docs, 3),
            n_merges=128,
            min_count=2,
            batch_size=64,
            pair_mode="delta",
            stats=st,
        ),
    }
    out = {}
    for tag, fn in workloads.items():
        times = {"driver": [], "distributed": []}
        base = None
        for rep in range(n):
            for arm in ("driver", "distributed"):
                merges, took, table, rounds = run(tag, fn, arm == "distributed")
                key = [(m["left"], m["right"], m["pair_count"]) for m in merges]
                if base is None:
                    base = key
                assert key == base, f"{tag} {arm} merge list diverged"
                times[arm].append(took)
                if rep == 0:
                    print(f"{tag} {arm}: table={table} rounds={rounds} {took}s",
                          flush=True)
        out[tag] = {
            a: {"min": min(t), "median": statistics.median(t), "all": t}
            for a, t in times.items()
        }

    # W3: recount vs driver-delta on the small bigram table
    times = {"recount": [], "delta": []}
    base = None
    for rep in range(n):
        for mode in ("recount", "delta"):
            stats: dict = {}
            t0 = time.perf_counter()
            merges = bpe_train(
                bpe_bigram_unit_table(docs),
                n_merges=256,
                min_count=2,
                batch_size=64,
                pair_mode=mode,
                stats=stats,
            )
            took = round(time.perf_counter() - t0, 3)
            key = [(m["left"], m["right"], m["pair_count"]) for m in merges]
            if base is None:
                base = key
            assert key == base, f"W3 {mode} merge list diverged"
            times[mode].append(took)
            if rep == 0:
                print(f"W3_bigram256 {mode}: table={stats.get('pair_table')} "
                      f"rounds={stats.get('rounds')} {took}s", flush=True)
    out["W3_bigram256"] = {
        m: {"min": min(t), "median": statistics.median(t), "all": t}
        for m, t in times.items()
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
