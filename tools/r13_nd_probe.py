"""r13 probe: where does x_prepare_corpus's near_dup_cc marginal go?

Replicates the bench's stage-attribution config (bench._prepare_corpus
_config) in ONE warmed session under the exact bench conf, then times
the near-dup stage's sub-pieces separately (guide §1: isolate with the
noop sink / bounded actions, label jobs):

  A  pipeline through span_dedup (the cumulative baseline)
  B  pipeline with near_dup_threshold on (cumulative; B−A = marginal)
  C1 members+reps build+persist (the shingle pass)
  C2 band join + dropDuplicates + exact-Jaccard verify (rep pairs)
  C3 connected_components on the verified rep pairs
  C4 full minhash_components (C1–C3 + member labeling)
  C5 the drop anti-join on top (what the pipeline adds around C4)

Each is min-of-K with the bench's between-repeat cache hygiene.
Usage: python tools/r13_nd_probe.py [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from data_toolz_spark.cache import clear_session_caches
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    spark = get_spark(
        app_name="r13-nd-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.driver.memory": bench._default_heap()},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod
    from data_toolz_spark.pipelines import prepare_training_corpus

    docs = entrymod.load(spark, SF_DIR, "documents")
    n_docs = docs.count()
    full = bench._prepare_corpus_config(n_docs)
    span_cfg = dict(
        full,
        near_dup_threshold=None,
        chunk_max_words=None,
        pack_budget=None,
    )
    nd_cfg = dict(
        full,
        chunk_max_words=None,
        pack_budget=None,
    )

    def timed(name, fn, k=K):
        best = float("inf")
        for _ in range(k):
            spark.sparkContext.setJobDescription(f"nd-probe: {name}")
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            clear_session_caches(spark)
            spark.sparkContext.setJobDescription(None)
        print(f"{name:28s} {best:7.3f} s  (min of {k})", flush=True)
        return best

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the session (JIT, parquet footer caches) once, untimed
    prepare_training_corpus(docs, None, **span_cfg).write.format(
        "noop"
    ).mode("overwrite").save()
    clear_session_caches(spark)

    timed("A span-cumulative", lambda: noop(
        prepare_training_corpus(docs, None, **span_cfg)))
    timed("B near_dup-cumulative", lambda: noop(
        prepare_training_corpus(docs, None, **nd_cfg)))

    # the cleaned frame the pipeline hands to minhash_components
    cleaned = prepare_training_corpus(docs, None, **span_cfg)

    from data_toolz_spark.operators.dedup import (
        _minhash_members_reps,
        _verified_rep_pairs,
        connected_components,
        minhash_components,
    )
    from pyspark import StorageLevel
    from data_toolz_spark.cache import track

    def c1():
        members, reps = _minhash_members_reps(
            cleaned, "doc_id", "text", shingle=3
        )
        members = track(members.persist(StorageLevel.MEMORY_AND_DISK))
        reps = track(reps.persist(StorageLevel.MEMORY_AND_DISK))
        members.count()
        reps.count()

    timed("C1 members+reps build", c1)

    def c2():
        members, reps = _minhash_members_reps(
            cleaned, "doc_id", "text", shingle=3
        )
        members = track(members.persist(StorageLevel.MEMORY_AND_DISK))
        reps = track(reps.persist(StorageLevel.MEMORY_AND_DISK))
        vr = _verified_rep_pairs(
            reps.filter(F.size("__elems") > 0),
            threshold=0.8, n_hashes=64, bands=16,
        )
        noop(vr)

    timed("C2 +band+verify", c2)

    def c3():
        members, reps = _minhash_members_reps(
            cleaned, "doc_id", "text", shingle=3
        )
        members = track(members.persist(StorageLevel.MEMORY_AND_DISK))
        reps = track(reps.persist(StorageLevel.MEMORY_AND_DISK))
        vr = _verified_rep_pairs(
            reps.filter(F.size("__elems") > 0),
            threshold=0.8, n_hashes=64, bands=16,
        )
        noop(connected_components(vr, id_a="fp_a", id_b="fp_b"))

    timed("C3 +connected_components", c3)

    timed("C4 minhash_components", lambda: noop(
        minhash_components(cleaned, "doc_id", "text", threshold=0.8)))

    def c5():
        cc = minhash_components(cleaned, "doc_id", "text", threshold=0.8)
        drops = cc.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        noop(cleaned.join(drops, on="doc_id", how="left_anti"))

    timed("C5 +drop anti-join", c5)


if __name__ == "__main__":
    main()
