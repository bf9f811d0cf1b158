"""Scale probe for r12 IVF cell rebalancing (X96).

Claims measured (appended to SCALE_PROBE.md between r12-ivfrebal
markers) on the REAL sf0.1 embeddings:

* **probe-cost skew restored bottom-up**: build a deliberately
  under-provisioned quantizer (n_centroids=4 over 64-dim embeddings —
  the drifted-index regime where appends concentrated mass), then
  rebalance with ``max_cell_frac`` until balanced; record the max
  cell fraction before/after and the cell count trajectory.  The max
  cell fraction IS the worst-case probe cost share at 100 TB.
* **work bounded by the hot cells**: rebalance wall vs a full
  ``build_ivf_index`` rebuild on the same corpus.
* **results unchanged**: full-probe top-k before == after (the
  operator moves rows between cells, never changes the indexed set).

Usage: python tools/r12_rebal_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_toolz_spark.operators.incremental import (
    build_ivf_index,
    ivf_query_index,
    rebalance_ivf_index,
    validate_ivf_index,
)
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BEGIN, END = "<!-- r12-ivfrebal:begin -->", "<!-- r12-ivfrebal:end -->"


def cell_stats(spark, prefix):
    rows = (
        spark.table(f"{prefix}_ivf_inv")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(int(r["n"]) for r in rows)
    mx = max(int(r["n"]) for r in rows)
    return len(rows), total, mx / total


def main() -> None:
    spark = get_spark(
        app_name="r12-rebal-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.orderBy("vec_id").limit(16)
    lines = []

    prefix = "probe_rebal"
    for t in ("ivf_meta", "ivf_centroids", "ivf_inv", "ivf_codebooks"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")

    t0 = time.monotonic()
    build_ivf_index(emb, prefix, dim=64, n_centroids=4, seed=7)
    build_wall = time.monotonic() - t0
    n0, total, frac0 = cell_stats(spark, prefix)
    before = sorted(
        map(
            tuple,
            ivf_query_index(spark, queries, prefix, k=10, n_probe=n0)
            .collect(),
        )
    )
    lines.append(
        f"build: {total} vectors, {n0} cells, max cell "
        f"{frac0:.1%} of the corpus, {build_wall:.1f}s"
    )

    rounds = 0
    t0 = time.monotonic()
    while rounds < 8:
        rep = rebalance_ivf_index(
            spark, prefix, max_cell_frac=0.15, split_factor=2
        )
        n_actions = rep.count()
        rounds += 1
        if n_actions == 0:
            break
    rebal_wall = time.monotonic() - t0
    n1, total1, frac1 = cell_stats(spark, prefix)
    meta_n = spark.table(f"{prefix}_ivf_meta").first()["n_centroids"]
    after = sorted(
        map(
            tuple,
            ivf_query_index(
                spark, queries, prefix, k=10, n_probe=int(meta_n)
            ).collect(),
        )
    )
    v = validate_ivf_index(spark, prefix)
    lines.append(
        f"rebalance to max_cell_frac=0.15: {rounds} rounds, "
        f"{rebal_wall:.1f}s total -> {n1} cells, max cell {frac1:.1%}; "
        f"vs full rebuild {build_wall:.1f}s"
    )
    lines.append(
        f"full-probe top-k before == after: {after == before}; rows "
        f"preserved: {total1 == total}; audit consistent: "
        f"{v['consistent']}"
    )
    if not (after == before and total1 == total and v["consistent"]):
        raise SystemExit("REBALANCE PROBE FAILURE")
    for t in ("ivf_meta", "ivf_centroids", "ivf_inv", "ivf_codebooks"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")

    block = "\n".join(
        [BEGIN, "## r12 IVF rebalance probe", ""]
        + [f"* {ln}" for ln in lines]
        + [END]
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.md",
    )
    text = open(path).read() if os.path.exists(path) else ""
    if BEGIN in text and END in text:
        pre, rest = text.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as fh:
        fh.write(text)
    print(block)
    spark.stop()


if __name__ == "__main__":
    main()
