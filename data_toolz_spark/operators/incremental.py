"""Incremental exact dedup against a persistent fingerprint catalog.

The batch dedup operators (``operators.dedup``) answer "which documents
in THIS corpus duplicate each other".  A production pipeline asks a
different question daily: "which documents in today's increment are
novel against everything ever ingested" — and re-scanning/re-shuffling
a 100 TB history per increment is the naive answer this module avoids.

Design:

* the catalog is a **bucketed table** of canonical text fingerprints
  (md5 of normalized text, ``text_fingerprint``), bucketed on the
  fingerprint.  Bucketing pre-shuffles the big side ONCE at write
  time; every later anti-join shuffles only the (small) increment to
  match the bucket layout — the catalog is read in place, no exchange
  (asserted by tests/test_plans.py-style plan checks).
* ``novel_documents`` is a left-anti join on the fingerprint: exact
  dedup semantics, including increment-internal duplicates when
  ``within_increment=True`` (keep the min-id representative, the same
  policy as ``dedup.dedup_exact``).
* ``append_to_catalog`` inserts the novel fingerprints back, keeping
  the bucket layout (``insertInto`` preserves bucketing for a bucketed
  catalog).

The same pattern extends to MinHash band tables for incremental
NEAR-dup (bucket the band table on (band, bucket)); exact fingerprints
are the common first gate and keep this module dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_toolz_spark.functions.text import text_fingerprint


def build_fingerprint_catalog(
    df: DataFrame,
    table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Create the bucketed fingerprint catalog from an initial corpus.

    Stores one row per DISTINCT fingerprint (min id as representative)
    — the catalog grows with unique content, not with corpus size.
    ``n_buckets`` sizes the permanent layout: pick so that
    |catalog| / n_buckets stays a comfortable task size at full scale
    (buckets cannot be changed later without a rewrite).
    """
    from data_toolz_spark.sources.io import DataIO

    fps = (
        df.select(
            text_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("first_id"),
        )
        .groupBy("fingerprint")
        .agg(F.min("first_id").alias("first_id"))
    )
    return DataIO().write_bucketed(
        fps,
        table,
        bucket_by=["fingerprint"],
        n_buckets=n_buckets,
        sort_by=["fingerprint"],
        path=path,
        mode=mode,
    )


def novel_documents(
    spark: SparkSession,
    increment: DataFrame,
    catalog_table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    within_increment: bool = True,
) -> DataFrame:
    """Rows of ``increment`` whose content is not in the catalog.

    Left-anti join on the canonical fingerprint: the bucketed catalog
    side is read in place (no exchange); only the increment shuffles,
    sized to the increment.  ``within_increment`` additionally
    collapses duplicates inside the increment itself to the min-id
    representative (otherwise two copies of a novel document both
    survive).  The returned frame carries a ``fingerprint`` column so
    it can feed :func:`append_to_catalog` without re-hashing.
    """
    with_fp = increment.withColumn(
        "fingerprint", text_fingerprint(F.col(text_col))
    )
    catalog = spark.table(catalog_table).select("fingerprint")
    # Anti-join FIRST: the planner then shuffles the increment straight
    # to the catalog's bucket count and the catalog scan stays
    # exchange-free.  (Collapsing within-increment dups before the join
    # would pin the join at spark.sql.shuffle.partitions and force the
    # catalog through a re-shuffle — the exact cost this module
    # exists to avoid.)
    novel = with_fp.join(catalog, on="fingerprint", how="left_anti")
    if within_increment:
        from pyspark.sql.window import Window

        w = Window.partitionBy("fingerprint").orderBy(id_col)
        novel = (
            novel.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return novel


def append_to_catalog(
    novel: DataFrame,
    catalog_table: str,
    *,
    id_col: str = "doc_id",
) -> None:
    """Insert novel fingerprints; bucket layout is preserved.

    ``insertInto`` on a bucketed table keeps writing bucketed files, so
    the next increment's anti-join stays exchange-free on the catalog
    side.  Input should be the output of :func:`novel_documents` (one
    row per novel fingerprint).
    """
    (
        novel.select(
            "fingerprint", F.col(id_col).alias("first_id")
        ).write.insertInto(catalog_table)
    )


__all__ = [
    "build_fingerprint_catalog",
    "novel_documents",
    "append_to_catalog",
]
