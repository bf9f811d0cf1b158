"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    source has fewer splits.

    Compute-heavy per-row stages (shingling, signatures, scoring) are
    CPU-bound: a small parquet file arrives as one split and would pin
    the whole stage to one core.  On a real cluster with many input
    splits this is a no-op — we never *shrink* the partition count, so
    wide inputs keep their natural parallelism.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        # cheap file-count probe; df.rdd.getNumPartitions() would build
        # the whole RDD lineage (~1 s of driver time per call)
        n_inputs = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_inputs < target:
        return df.repartition(target)
    return df


__all__ = ["spread"]
