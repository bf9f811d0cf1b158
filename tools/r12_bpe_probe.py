"""Scale probe for the round-12 BPE work: delta-maintained pair
counts (``pair_mode="delta"``, VERDICT r11 task 1).

Claims measured (appended to SCALE_PROBE.md between r12-bpe markers):

* **2048-merge vocab-scale run** over the word-trigram unit table
  (~27k distinct units at sf0.1) in delta mode — the r11 VERDICT
  "done" demonstration.  Records wall, rounds, merges/round, and the
  per-round wall DECAY (later rounds merge rarer pairs, so the
  affected slice — and with it the signed recount — shrinks; the
  Zipf-tail regime is where a real 32k-merge run spends ~all its
  rounds).
* **delta vs recount** at 256 merges on the same table: delta's
  candidates come from the persisted (l, r, cnt) table + an
  affected-slice recount instead of a full ~800k-pair re-explode per
  round.
* **bit-parity**: the delta 256-merge prefix equals the recount
  merge list rank for rank (the randomized differentials in
  tests/test_bpe.py pin this corpus-independently; this pins it on
  the real table).

Honest boundary, recorded with the numbers: on this synthetic corpus
(31 distinct words) the EARLY rounds' top pairs occur in nearly every
unit, so the affected fraction starts near 1 and both modes pay the
same head; the delta advantage is the tail.  On a 1.16M-unit
n-gram-union table the recount path could not finish 128 merges in a
9-minute budget while delta's per-round cost is bounded by the
affected slice once past the head.

Usage: python tools/r12_bpe_probe.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_toolz_spark.operators.bpe import (
    bpe_ngram_unit_table,
    bpe_train,
)
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BEGIN, END = "<!-- r12-bpe:begin -->", "<!-- r12-bpe:end -->"


def main() -> None:
    spark = get_spark(
        app_name="r12-bpe-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    units = bpe_ngram_unit_table(docs, 3).localCheckpoint()
    n_units = units.count()
    lines = [f"unit table: word trigrams of {SF_DIR}, {n_units} rows"]

    # -- delta vs recount at 256 merges, bit-parity on the real table
    walls = {}
    got = {}
    for mode in ("delta", "recount"):
        st: dict = {}
        t0 = time.monotonic()
        got[mode] = bpe_train(
            units, n_merges=256, min_count=2, batch_size=64,
            pair_mode=mode, stats=st,
        )
        walls[mode] = time.monotonic() - t0
        lines.append(
            f"256 merges [{mode}]: {walls[mode]:.1f}s in "
            f"{st['rounds']} rounds "
            f"(mean {statistics.mean(st['batch_sizes']):.2f} "
            f"merges/round)"
        )
    parity = [
        (m["left"], m["right"], m["pair_count"]) for m in got["delta"]
    ] == [
        (m["left"], m["right"], m["pair_count"]) for m in got["recount"]
    ]
    lines.append(
        f"bit-parity delta==recount over all 256 merges: {parity}"
    )
    if not parity:
        raise SystemExit("PARITY FAILURE: delta != recount")

    # -- the 2048-merge vocab-scale run (delta)
    st2: dict = {}
    t0 = time.monotonic()
    big = bpe_train(
        units, n_merges=2048, min_count=2, batch_size=256,
        pair_mode="delta", stats=st2,
    )
    wall = time.monotonic() - t0
    rs = st2["round_secs"]
    q = max(1, len(rs) // 4)
    quarters = [
        f"{statistics.mean(rs[i * q:(i + 1) * q or None]):.3f}"
        for i in range(4)
    ]
    lines.append(
        f"2048 merges [delta]: {len(big)} merges, {wall:.1f}s in "
        f"{st2['rounds']} rounds "
        f"(mean {statistics.mean(st2['batch_sizes']):.2f} merges/round; "
        f"per-round wall by quarter: {', '.join(quarters)} s — the "
        f"tail-regime decay)"
    )
    # the 256-merge prefix of the 2048 run must equal the 256 run
    prefix_ok = [
        (m["left"], m["right"]) for m in big[:256]
    ] == [(m["left"], m["right"]) for m in got["delta"]]
    lines.append(f"2048-run 256-merge prefix parity: {prefix_ok}")
    if not prefix_ok:
        raise SystemExit("PREFIX PARITY FAILURE")

    block = "\n".join([BEGIN, "## r12 BPE delta-pair-table probe", ""]
                      + [f"* {ln}" for ln in lines] + [END])
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


if __name__ == "__main__":
    main()
