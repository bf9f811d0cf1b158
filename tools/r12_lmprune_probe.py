"""Scale probe for r12 bigram-LM entropy pruning (X97).

Claims measured (appended to SCALE_PROBE.md between r12-lmprune
markers) on the REAL sf0.1 documents:

* **model shrink vs signal retention, against the naive baseline**:
  prune the corpus-trained bigram table at increasing top-k budgets
  and record, per budget, the fraction of documents whose CCNet
  head/middle/tail perplexity bucket is UNCHANGED vs the full model
  — the judgement a pruned LM is actually used for — for
  divergence-ranked keeping AND for the naive keep-highest-count
  baseline a criterion must beat.  Regime caveat recorded with the
  numbers: this synthetic corpus has a ~31-word vocabulary and only
  ~931 bigrams, ALL high-mass — there is no Zipf tail of
  backoff-approximated bigrams, which is exactly what real-corpus
  Stolcke pruning exploits; agreement fractions here are therefore
  a WORST-CASE floor, and the comparison against count-ranked
  keeping is the informative signal.
* **epsilon=0 is the identity**: every divergence is >= 0, so the
  epsilon=0 prune keeps every row and reproduces the full model's
  buckets exactly.

Usage: python tools/r12_lmprune_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_toolz_spark.operators.text_analysis import (
    bigram_logprob,
    bucket_by_thresholds,
    build_bigram_counts,
    build_vocab,
    prune_bigram_counts,
    rank_thresholds,
)
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BEGIN, END = "<!-- r12-lmprune:begin -->", "<!-- r12-lmprune:end -->"


def buckets_under(docs, bigram, vocab):
    scored = bigram_logprob(docs, bigram, vocab)
    thr = rank_thresholds(scored, "bg_nll", [(1, 3), (2, 3)])
    return bucket_by_thresholds(
        scored, "bg_nll", thr, labels=("head", "middle", "tail")
    ).select("doc_id", "ppl_bucket")


def main() -> None:
    spark = get_spark(
        app_name="r12-lmprune-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    vocab = build_vocab(docs).persist()
    bigram = build_bigram_counts(docs).persist()
    n_docs = docs.count()
    n_bi = bigram.count()
    lines = [f"corpus: {SF_DIR} documents, {n_docs} docs, {n_bi} bigrams"]

    full = buckets_under(docs, bigram, vocab).persist()
    full.count()

    ident = buckets_under(
        docs, prune_bigram_counts(bigram, vocab, epsilon=0.0), vocab
    )
    same_ident = (
        full.alias("a")
        .join(ident.alias("b"), on="doc_id")
        .filter(F.col("a.ppl_bucket").eqNullSafe(F.col("b.ppl_bucket")))
        .count()
    )
    lines.append(
        f"epsilon=0 identity: {same_ident}/{n_docs} buckets unchanged "
        f"(must be all)"
    )
    if same_ident != n_docs:
        raise SystemExit("EPSILON-0 IDENTITY FAILURE")

    def agreement(model):
        b = buckets_under(docs, model, vocab)
        return (
            full.alias("a")
            .join(b.alias("b"), on="doc_id")
            .filter(
                F.col("a.ppl_bucket").eqNullSafe(F.col("b.ppl_bucket"))
            )
            .count()
        )

    for k in (n_bi // 2, n_bi // 4, n_bi // 10):
        pruned = prune_bigram_counts(bigram, vocab, top_k=k)
        kept = pruned.count()
        same = agreement(pruned)
        # the naive baseline a pruning criterion must beat: keep the
        # k highest-COUNT bigrams
        naive = bigram.orderBy(
            F.col("bg_count").desc(), F.col("w1"), F.col("w2")
        ).limit(k)
        same_naive = agreement(naive)
        lines.append(
            f"top_k={k} ({kept / n_bi:.0%} of rows): buckets unchanged "
            f"{same}/{n_docs} ({same / n_docs:.1%}) divergence-ranked "
            f"vs {same_naive}/{n_docs} ({same_naive / n_docs:.1%}) "
            f"count-ranked"
        )

    lines.append(
        "reading: on this corpus the two rankings nearly coincide — "
        "every bigram is high-mass, so divergence is almost monotone "
        "in count and the log-ratio term has nothing to differentiate;"
        " the criterion separates from the naive baseline exactly when"
        " a Zipf tail of backoff-approximated bigrams exists (real web"
        " corpora), which this synthetic table does not have.  The "
        "load-bearing pins are the epsilon=0 identity here and the "
        "scorer-identity/pure-backoff tests in test_unigram_lm.py."
    )
    block = "\n".join(
        [BEGIN, "## r12 LM entropy-pruning probe", ""]
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
