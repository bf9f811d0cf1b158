"""Scale probe for the round-10 session-2 operators: per-site
frequency capping, exact rank thresholds, greedy k-center selection,
and quality-aware component representatives, at 1x/5x/20x of sf0.1
(same id-offset replication device as tools/scale_probe.py).

Claims measured (appended to SCALE_PROBE.md between r10b-ops markers):

* cap_per_domain on a skew-planted corpus (one mega-site holding half
  the docs): survivors per saturated site == cap at EVERY scale (the
  survivor count is quota-bounded, not corpus-bounded), and the
  two-stage rank keeps wall tracking the scan even as the mega-site
  grows 20x;
* rank_thresholds over a quantized score: the histogram the ordered
  cumsum runs on is DOMAIN-bounded, so the thresholds are IDENTICAL at
  every scale (replication preserves the distribution — an exact
  invariance signal riding the perf probe) and wall tracks the one
  corpus scan;
* kcenter_select m=8: wall tracks corpus x m (stateless rescans),
  driver state stays m x dim, and the early-stop never trips on 20x
  duplicate copies (the selection still finds m distinct vectors);
* component_representatives on ONE mega-component of corpus size: the
  skew-safe two-stage argmax returns the same winner at every scale
  (replicas tie on score, min id wins) without pinning a task.

Usage: python tools/r10b_ops_probe.py [max_mult]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_toolz_spark.operators.clustering import kcenter_select
from data_toolz_spark.operators.dedup import component_representatives
from data_toolz_spark.operators.text_analysis import rank_thresholds
from data_toolz_spark.operators.urls import cap_per_domain
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BEGIN, END = "<!-- r10b-ops:begin -->", "<!-- r10b-ops:end -->"


def replicate(df, id_col: str, mult: int, stride: int = 1_000_000):
    if mult == 1:
        return df
    out = df
    for i in range(1, mult):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * stride))
        )
    return out


def main() -> int:
    max_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    mults = [m for m in (1, 5, 20) if m <= max_mult]
    spark = get_spark(
        app_name="r10b-ops-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    docs = entrymod.load(spark, SF_DIR, "documents")
    n_docs0 = docs.count()
    emb = entrymod.load(spark, SF_DIR, "embeddings")

    # one unigram model trained at 1x encodes every scale (bounded
    # state — the multiclass_score argument)
    from data_toolz_spark.operators.unigram import (
        unigram_encode,
        unigram_train,
        unigram_word_table,
    )

    uni = unigram_train(
        unigram_word_table(docs), vocab_size=256, n_iter=2,
        max_piece_len=6, seed_size=4096, min_count=2,
    )

    rows = []
    for mult in mults:
        d = replicate(docs, "doc_id", mult).persist()
        n = d.count()

        # skew plant: every even doc lands on ONE mega-site, the rest
        # spread over 1000 small sites — the template-farm shape
        urls = d.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("https://mega.example/p")
            )
            .otherwise(
                F.concat(
                    F.lit("https://s"),
                    (F.col("doc_id") % 1000).cast("string"),
                    F.lit(".example/p"),
                )
            )
            .alias("url"),
        )
        t0 = time.perf_counter()
        kept = cap_per_domain(
            urls, id_col="doc_id", url_col="url", max_per_domain=50
        )
        mega_kept = kept.filter(
            F.col("domain") == "mega.example"
        ).count()
        t_cap = round(time.perf_counter() - t0, 2)

        scored = d.select(
            "doc_id",
            F.pmod(F.xxhash64("text"), F.lit(10_000)).alias("s"),
        )
        t0 = time.perf_counter()
        thr = {
            (r["q_num"], r["q_den"]): r["threshold"]
            for r in rank_thresholds(
                scored, "s", [(1, 3), (2, 3)]
            ).collect()
        }
        t_thr = round(time.perf_counter() - t0, 2)

        e = replicate(emb, "vec_id", mult)
        t0 = time.perf_counter()
        kc = kcenter_select(e, dim=64, m=8, seed=42, scale=1024)
        t_kc = round(time.perf_counter() - t0, 2)

        from data_toolz_spark.operators.text_analysis import clean_text

        t0 = time.perf_counter()
        n_clean = (
            d.select(F.length(clean_text("text")).alias("l"))
            .agg(F.sum("l"))
            .collect()[0][0]
        )
        t_clean = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        n_uids = (
            unigram_encode(d, uni)
            .agg(F.sum(F.size("ids")))
            .collect()[0][0]
        )
        t_uni = round(time.perf_counter() - t0, 2)

        onecomp = d.select(
            F.col("doc_id").alias("id"), F.lit(0).alias("component")
        )
        t0 = time.perf_counter()
        winner = (
            component_representatives(
                onecomp,
                d.select(
                    F.col("doc_id").alias("id"),
                    F.length("text").alias("tl"),
                ),
                score_col="tl",
            )
            .select("kept_id")
            .distinct()
            .collect()
        )
        t_rep = round(time.perf_counter() - t0, 2)
        d.unpersist()

        rows.append(
            (mult, n, mega_kept, t_cap,
             f"{thr[(1, 3)]}/{thr[(2, 3)]}", t_thr,
             kc.m, min(kc.radii), t_kc,
             int(winner[0]["kept_id"]), t_rep, int(n_clean), t_clean,
             int(n_uids), t_uni)
        )
        print(
            f"mult={mult}: cap {t_cap}s (mega kept {mega_kept}), "
            f"thr {t_thr}s ({thr}), kcenter {t_kc}s (m={kc.m}, "
            f"min_r={min(kc.radii)}), rep {t_rep}s "
            f"(winner {winner[0]['kept_id']}), clean {t_clean}s "
            f"(chars {n_clean}), uni-encode {t_uni}s (ids {n_uids})",
            flush=True,
        )

    lines = [
        BEGIN,
        "",
        "Round-10 session-2 operators at 1x/5x/20x (id-offset "
        "replication; cap=50 with an even-id mega-site; thresholds "
        "over a 10k-value quantized score; k-center m=8 over the "
        "replicated embeddings; representatives over ONE "
        "corpus-sized component scored by text length):",
        "",
        "| mult | docs | mega kept | cap s | thresholds (1/3, 2/3) |"
        " thr s | kc m | kc min radius | kc s | rep winner | rep s |"
        " clean chars | clean s | uni ids | uni s |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(
            f"{v:,}" if isinstance(v, int) else str(v) for v in r
        ) + " |")
    lines += [
        "",
        "The mega-site keeps exactly the 50-doc quota at every scale; "
        "the rank thresholds are bit-identical across scales "
        "(replication preserves the score distribution and the "
        "cumsum runs on the bounded histogram, not the corpus); "
        "k-center finds m=8 distinct exemplars with positive radii "
        "even when 95% of the corpus is duplicate copies; the "
        "mega-component winner is scale-invariant (score ties break "
        "to the min id, which replication never changes); clean_text "
        "(NFC Arrow kernel + 7 codegen replaces) tracks the scan — "
        "repaired char counts scale exactly mult-fold; unigram "
        "encoding with the ONE model trained at 1x (bounded state) "
        "tracks the scan with id counts scaling exactly mult-fold — "
        "the Viterbi DP only ever runs over the DISTINCT words, which "
        "replication does not grow.",
        "",
        END,
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALE_PROBE.md")
    txt = open(path).read()
    block = "\n".join(lines)
    if BEGIN in txt:
        pre = txt[: txt.index(BEGIN)]
        post = txt[txt.index(END) + len(END):]
        txt = pre + block + post
    else:
        txt = txt.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(txt)
    print("SCALE_PROBE.md updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
