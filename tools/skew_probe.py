"""Mega-cluster skew probe: near-dup drop list when one document has k
identical copies — the real shape of crawl corpora (error pages, empty
templates repeated millions of times).

Two paths produce the same drop list:

* ``pairs``      — ``near_duplicate_drop_list(minhash_near_duplicates)``:
  candidate generation is collapse-protected (O(k)), but the OUTPUT
  expansion materializes the identical cluster's k(k-1)/2 member pairs
  and feeds them to the CC loop;
* ``components`` — ``minhash_components`` (r6): transitive closure over
  the fingerprint graph, members join in once — O(k) end to end.

Appends a marker-delimited section to SCALE_PROBE.md.
Usage: python tools/skew_probe.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_toolz_spark.operators.dedup import (
    minhash_components,
    minhash_near_duplicates,
    near_duplicate_drop_list,
)
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

MARKER_BEGIN = "<!-- skew-probe:begin -->"
MARKER_END = "<!-- skew-probe:end -->"


def main() -> int:
    spark = get_spark(
        app_name="skew-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_toolz_spark.cache import clear_session_caches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = docs.limit(1).select("text")

    def corpus(k: int):
        mega = (
            spark.range(k)
            .crossJoin(one)
            .select((F.col("id") + 10_000_000).alias("doc_id"), "text")
        )
        return docs.select("doc_id", "text").unionByName(mega)

    # warmup
    minhash_components(corpus(100), "doc_id", "text").count()
    clear_session_caches(spark)

    rows = []
    for k in (1_000, 4_000, 20_000):
        c = corpus(k)
        t0 = time.perf_counter()
        n_comp = minhash_components(
            c, "doc_id", "text", threshold=0.8
        ).filter(F.col("id") != F.col("component")).count()
        t_comp = round(time.perf_counter() - t0, 2)
        clear_session_caches(spark)
        if k <= 4_000:
            t0 = time.perf_counter()
            n_pairs = near_duplicate_drop_list(
                minhash_near_duplicates(
                    c, "doc_id", "text", threshold=0.8
                ),
                exact=True,
            ).count()
            t_pairs = round(time.perf_counter() - t0, 2)
            assert n_pairs == n_comp, (n_pairs, n_comp)
        else:
            t_pairs = None  # k²/2 = 2e8 member edges — not run locally
        clear_session_caches(spark)
        rows.append((k, t_comp, t_pairs, n_comp))
        print(
            f"k={k}: components {t_comp}s, pairs "
            f"{t_pairs if t_pairs is not None else 'skipped'}s, "
            f"{n_comp} drops",
            flush=True,
        )
        _write_md(rows)
    print("wrote SCALE_PROBE.md (skew section)")
    return 0


def _write_md(rows) -> None:
    lines = [
        MARKER_BEGIN,
        "",
        "## Mega-cluster skew — k identical copies (tools/skew_probe.py)",
        "",
        "Drop list over sf0.1 documents + ONE doc replicated k times —",
        "the crawl-skew shape (error pages repeated millions of times).",
        "`components` = `minhash_components` (fp-graph closure, member",
        "pairs never materialized, r6); `pairs` = the",
        "`minhash_near_duplicates` → CC path, whose output expansion",
        "is k²/2 member edges for the identical cluster (skipped at",
        "k=20k: 2·10⁸ edges).  Both verified equal where both run:",
        "",
        "| k copies | components s | pairs s | drops |",
        "|---|---|---|---|",
    ]
    for k, tc, tp, n in rows:
        tp_s = f"{tp}" if tp is not None else "— (2·10⁸ edges, skipped)"
        lines.append(f"| {k:,} | {tc} | {tp_s} | {n:,} |")
    lines += ["", MARKER_END]
    block = "\n".join(lines)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE.md")
    text = open(path).read()
    if MARKER_BEGIN in text:
        text = re.sub(
            re.escape(MARKER_BEGIN) + r".*?" + re.escape(MARKER_END),
            block,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(text)


if __name__ == "__main__":
    raise SystemExit(main())
