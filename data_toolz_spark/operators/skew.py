"""Skew-mitigation helpers: salted two-phase aggregation and salted
broadcast-side replication.

AQE's skew-join splitting handles most shuffle skew automatically
(enabled by default in ``session.get_spark``); these helpers cover the
cases AQE cannot: a single hot *group key* in an aggregation whose
partial states are large (collect_list-style), and a hot key joining a
broadcast-unfriendly dimension.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregates with an algebraic merge step usable in the final phase
_MERGEABLE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partials
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output column → (agg, input column), with agg in
    {sum, count, min, max, avg}.  avg decomposes into sum+count
    partials so the merge stays algebraic.

    When one key holds a large share of all rows, a single-phase
    ``groupBy(keys)`` funnels that key's every row through one reducer
    task; salting splits the hot key across ``salt_buckets`` partial
    aggregates and merges the (tiny) partials.  Spark's own partial
    aggregation already does this for most built-ins — this operator is
    for when the partial state itself is heavy or a deterministic
    two-stage plan is wanted regardless of AQE decisions.
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")

    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (how, col) in aggs.items():
        if how == "avg":
            partial_exprs.append(F.sum(col).alias(f"__{out}_sum"))
            partial_exprs.append(F.count(col).alias(f"__{out}_cnt"))
            final_exprs.append(
                (F.sum(f"__{out}_sum") / F.sum(f"__{out}_cnt")).alias(out)
            )
            continue
        if how not in _MERGEABLE:
            raise ValueError(
                f"unsupported agg {how!r}; use one of "
                f"{sorted(_MERGEABLE) + ['avg']}"
            )
        partial = (
            F.count(col) if how == "count" else getattr(F, how)(col)
        )
        partial_exprs.append(partial.alias(f"__{out}_p"))
        final_exprs.append(_MERGEABLE[how](f"__{out}_p").alias(out))

    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *partial_exprs
    )
    return partial.groupBy(*keys).agg(*final_exprs)


def replicate_hot_keys_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    on: str,
    hot_keys: Sequence,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the hot keys' dim rows replicated across salt buckets.

    Fact rows for a hot key get a random salt in [0, salt_buckets); the
    dim side replicates each hot key's row once per bucket, so the hot
    key's shuffle partition splits ``salt_buckets`` ways.  Cold keys
    join on salt 0 exactly as before.  Use when the dim is too big to
    broadcast outright and AQE's split is insufficient (e.g. a single
    key > one task's memory).
    """
    hot = F.lit(None)
    for k in hot_keys:
        hot = F.when(F.col(on) == F.lit(k), F.lit(True)).otherwise(hot)
    # Salt must be deterministic PER ROW, not per draw: F.rand is seeded
    # per partition+ordering, so a retried task after an upstream shuffle
    # can re-draw different salts and duplicate/lose rows under task
    # retry at cluster scale.  Hashing the whole row gives a stable,
    # retry-safe bucket (full-duplicate rows share a bucket — acceptable,
    # the split only needs row-level spread, not uniqueness).
    row_hash = F.xxhash64(*[F.col(c) for c in fact.columns])
    fact_salted = fact.withColumn(
        "__salt",
        F.when(
            hot.isNotNull(),
            F.pmod(row_hash, F.lit(salt_buckets)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    # explode cannot live inside when(); build the replica list and
    # explode it unconditionally — cold keys carry a 1-element list
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    dim_salted = (
        dim.withColumn(
            "__salts",
            F.when(hot.isNotNull(), buckets).otherwise(F.array(F.lit(0))),
        )
        .withColumn("__salt", F.explode("__salts"))
        .drop("__salts")
    )
    joined = fact_salted.join(dim_salted, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


__all__ = ["salted_aggregate", "replicate_hot_keys_join"]
