"""Scale probe for the r12 driver-side tokenizer trainers.

Claims measured (appended to SCALE_PROBE.md between r12-localtok
markers):

* **a real 32k-merge BPE vocab is tractable**: `bpe_train_local` over
  the word-4-gram unit table of the sf0.1 documents (~210k units —
  one corpus shuffle builds it; the merge loop runs driver-side with
  zero Spark jobs).  The distributed delta path priced 2,048 merges
  at 601 s (SCALE_PROBE r12-bpe); the VERDICT r11 concern was that a
  32k vocab is therefore ~15k rounds.  This records the actual
  driver-side wall for the full 32,768 merges.
* **prefix parity on real data**: the first 64 merges of the local
  trainers equal the distributed trainers' output bit-for-bit on the
  word-trigram unit table (the pytest differentials pin randomized
  corpora; this pins the real corpus).
* **WordPiece at vocab scale**: `wordpiece_train_local` for 2,048
  merges on the trigram units — the distributed WP path is
  one-merge-per-round by design (scores are not batch-stable) and
  priced 128 merges at 149 s; this records the driver-side wall.

Usage: python tools/r12_local_tok_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_toolz_spark.operators.bpe import (
    bpe_ngram_unit_table,
    bpe_train,
    bpe_train_local,
)
from data_toolz_spark.operators.wordpiece import (
    wordpiece_train,
    wordpiece_train_local,
)
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BEGIN, END = "<!-- r12-localtok:begin -->", "<!-- r12-localtok:end -->"


def main() -> None:
    spark = get_spark(
        app_name="r12-local-tok-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    lines = []

    tri = bpe_ngram_unit_table(docs, 3).localCheckpoint()
    n_tri = tri.count()

    # -- real-data prefix parity vs the distributed trainers
    loc = bpe_train_local(tri, n_merges=64, min_count=2)
    dist = bpe_train(tri, n_merges=64, min_count=2, batch_size=8)
    bpe_par = loc == dist
    wloc = wordpiece_train_local(tri, n_merges=64, min_count=2)
    wdist = wordpiece_train(tri, n_merges=64, min_count=2)
    wp_par = wloc == wdist
    lines.append(
        f"64-merge prefix parity on {n_tri} trigram units — "
        f"BPE local==distributed: {bpe_par}; WordPiece "
        f"local==distributed (incl. IEEE score doubles): {wp_par}"
    )
    if not (bpe_par and wp_par):
        raise SystemExit("LOCAL/DISTRIBUTED PARITY FAILURE")

    # -- the 32k-merge BPE vocab
    four = bpe_ngram_unit_table(docs, 4).localCheckpoint()
    n_four = four.count()
    st: dict = {}
    t0 = time.monotonic()
    merges = bpe_train_local(
        four, n_merges=32768, min_count=2, stats=st
    )
    wall = time.monotonic() - t0
    lines.append(
        f"BPE 32k vocab: {len(merges)} merges on {n_four} 4-gram "
        f"units in {wall:.1f}s total ({st['train_secs']:.1f}s "
        f"driver loop incl. collect) — vs 601 s for 2,048 merges on "
        f"the distributed delta path (r12-bpe)"
    )

    # -- WordPiece at vocab scale
    st2: dict = {}
    t0 = time.monotonic()
    wmerges = wordpiece_train_local(
        tri, n_merges=2048, min_count=2, stats=st2
    )
    wall2 = time.monotonic() - t0
    lines.append(
        f"WordPiece 2,048 merges on {n_tri} trigram units: "
        f"{len(wmerges)} merges in {wall2:.1f}s — vs 149 s for 128 "
        f"merges on the distributed delta-table path (r12-wp)"
    )

    block = "\n".join(
        [BEGIN, "## r12 driver-side tokenizer trainer probe", ""]
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
