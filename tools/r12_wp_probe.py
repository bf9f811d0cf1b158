"""Scale probe for the round-12 WordPiece work (X92).

Claims measured (appended to SCALE_PROBE.md between r12-wp markers):

* **merge-sequence scale invariance**: training on 1x/5x/20x
  replications of the sf0.1 corpus must pick the identical merge
  sequence with pair AND symbol counts scaling exactly mult-fold.
  The argument is arithmetic, not statistical: replication multiplies
  every frequency by m, so every exact score quotient
  cnt/(cl*cr) becomes q/m — division by a positive constant preserves
  the order of exact quotients, and IEEE-754 correctly-rounded
  division is monotone in the exact value, so the per-rank argmax
  can only change if two distinct scaled scores round to the SAME
  double and the (l, r) tie-break flips — the probe verifies no such
  collision occurs on the real data.
* **token-count linearity**: greedy wp_token counts over the
  replicated corpus sum to exactly mult x the 1x total (the Arrow
  kernel only ever sees DISTINCT words, which replication does not
  grow).
* **vocab-scale sequential run**: 128 merges on the word-trigram
  unit table (~27k units) — WordPiece rounds are one-merge-per-round
  by design (scores are not batch-stable; see operators/wordpiece.py)
  but each round is vocab-adjacency-bounded via the delta-maintained
  pair + symbol tables; records wall + per-round decay by quarter.

Usage: python tools/r12_wp_probe.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import data_toolz_spark.operators.bpe as bpemod
from data_toolz_spark.operators.bpe import (
    bpe_ngram_unit_table,
    bpe_word_table,
)

# This probe measures the DISTRIBUTED per-round machinery (rounds /
# round_secs telemetry); the r12 auto-local arm neither runs rounds
# nor reports them, so force the distributed arm like
# tools/r12c_pair_probe.py does.
bpemod._LOCAL_UNIT_CAP = 0
from data_toolz_spark.operators.wordpiece import (
    wordpiece_base_pieces,
    wordpiece_token_count,
    wordpiece_train,
    wordpiece_vocab,
)
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BEGIN, END = "<!-- r12-wp:begin -->", "<!-- r12-wp:end -->"

N_MERGES = 24
MULTS = (1, 5, 20)


def main() -> None:
    spark = get_spark(
        app_name="r12-wp-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    lines = [f"corpus: {SF_DIR} documents, {n_docs} docs"]

    # -- merge-sequence invariance + count linearity at 1x/5x/20x
    results = {}
    tok_totals = {}
    for mult in MULTS:
        rep = docs.crossJoin(
            spark.range(mult).select(F.col("id").alias("__rep"))
        ).select(
            (F.col("doc_id") * mult + F.col("__rep")).alias("doc_id"),
            "text",
        )
        wt = bpe_word_table(rep).persist()
        st: dict = {}
        t0 = time.monotonic()
        merges = wordpiece_train(
            wt, n_merges=N_MERGES, min_count=2, stats=st
        )
        wall = time.monotonic() - t0
        vocab = wordpiece_vocab(merges, wordpiece_base_pieces(wt))
        wt.unpersist()
        total = (
            wordpiece_token_count(rep, vocab)
            .agg(F.sum("wp_tokens").alias("t"))
            .collect()[0]["t"]
        )
        results[mult] = merges
        tok_totals[mult] = total
        lines.append(
            f"mult {mult}: {len(merges)} merges in {st['rounds']} "
            f"rounds, {wall:.1f}s; total wp tokens {total}"
        )
    seq_ok = all(
        [(m["left"], m["right"], m["merged"]) for m in results[mult]]
        == [(m["left"], m["right"], m["merged"]) for m in results[1]]
        for mult in MULTS
    )
    cnt_ok = all(
        [
            (
                m["pair_count"],
                m["left_count"],
                m["right_count"],
            )
            for m in results[mult]
        ]
        == [
            (
                m["pair_count"] * mult,
                m["left_count"] * mult,
                m["right_count"] * mult,
            )
            for m in results[1]
        ]
        for mult in MULTS
    )
    tok_ok = all(
        tok_totals[mult] == tok_totals[1] * mult for mult in MULTS
    )
    lines.append(
        f"merge sequence identical across scales: {seq_ok}; pair/"
        f"symbol counts scale exactly mult-fold: {cnt_ok}; wp token "
        f"totals scale exactly mult-fold: {tok_ok}"
    )
    if not (seq_ok and cnt_ok and tok_ok):
        raise SystemExit("WP SCALE INVARIANCE FAILURE")

    # -- vocab-scale sequential run on the trigram unit table
    units = bpe_ngram_unit_table(docs, 3).localCheckpoint()
    n_units = units.count()
    st2: dict = {}
    t0 = time.monotonic()
    big = wordpiece_train(units, n_merges=128, min_count=2, stats=st2)
    wall = time.monotonic() - t0
    rs = st2["round_secs"]
    q = max(1, len(rs) // 4)
    quarters = [
        f"{statistics.mean(rs[i * q:(i + 1) * q or None]):.3f}"
        for i in range(4)
    ]
    lines.append(
        f"128 merges on {n_units} trigram units: {len(big)} merges, "
        f"{wall:.1f}s in {st2['rounds']} rounds (per-round wall by "
        f"quarter: {', '.join(quarters)} s)"
    )

    block = "\n".join([BEGIN, "## r12 WordPiece probe", ""]
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
