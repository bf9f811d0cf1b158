"""Persistent inverted text index: token → document posting lists,
with AND/OR term search and incremental append.

The query-side counterpart of the curation operators: after a corpus
is cleaned and deduplicated, "which documents mention X (and Y)" is
the question analysts and filter-authors ask daily — and answering it
with a full-text scan re-reads 100 TB per query.  The index is built
once (one tokenize + explode + distinct pass), persisted as a BUCKETED
table sorted by token, and every search is a posting-list scan:

* the search predicate (``token IN (…)``) pushes into the parquet
  scan, and because files are bucketed+sorted by token, row-group
  min/max stats prune almost everything that doesn't match;
* AND-semantics is one aggregate over the matching postings
  (``count(DISTINCT token) == n_terms`` per doc) — no self-joins,
  no intersection explosion;
* appends go through ``insertInto`` which preserves the bucket
  layout, so the index grows without rewrites (same pattern as the
  fingerprint catalog in ``operators.incremental``).

Postings store DISTINCT (token, id): index size is bounded by
vocabulary × containing-docs, not token occurrences.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_toolz_spark.functions.text import tokens


from data_toolz_spark.catalog import drop_stale_table as _drop_stale


def _postings(
    df: DataFrame, id_col: str, text_col: str, lowercase: bool
) -> DataFrame:
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    return (
        df.select(
            F.explode(tokens(txt)).alias("token"),
            F.col(id_col).alias("id"),
        )
        .distinct()
    )


def build_text_index(
    df: DataFrame,
    table_prefix: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    n_buckets: int = 64,
    path: str | None = None,
) -> str:
    """Create the bucketed posting-list table (+ a meta table pinning
    the tokenization config so a mismatched search/append fails loud)."""
    from data_toolz_spark.sources.io import DataIO

    spark = df.sparkSession
    _drop_stale(spark, f"{table_prefix}_ix_meta")
    if path is None:
        _drop_stale(spark, f"{table_prefix}_ix_postings")
    meta = spark.createDataFrame(
        [(bool(lowercase),)], "lowercase boolean"
    )
    meta.write.mode("overwrite").saveAsTable(f"{table_prefix}_ix_meta")
    DataIO().write_bucketed(
        _postings(df, id_col, text_col, lowercase),
        f"{table_prefix}_ix_postings",
        bucket_by=["token"],
        n_buckets=n_buckets,
        sort_by=["token"],
        path=None if path is None else f"{path}/postings",
    )
    return table_prefix


def search_terms(
    spark: SparkSession,
    table_prefix: str,
    terms: Sequence[str],
    *,
    mode: str = "and",
) -> DataFrame:
    """Documents matching the terms: ``(id, n_matched)``.

    ``mode="and"`` returns docs containing EVERY term, ``"or"`` docs
    containing ANY.  One posting scan (the ``token IN (…)`` predicate
    pushes down; bucketed+sorted files prune) + one aggregate keyed by
    doc id — never a per-term self-join.
    """
    if not terms:
        raise ValueError("search_terms: terms must be non-empty")
    if mode not in ("and", "or"):
        raise ValueError("search_terms: mode must be 'and' or 'or'")
    meta = spark.table(f"{table_prefix}_ix_meta").first()
    wanted = [t.lower() if meta["lowercase"] else t for t in terms]
    wanted = sorted(set(wanted))
    hits = (
        spark.table(f"{table_prefix}_ix_postings")
        .filter(F.col("token").isin(wanted))
        .groupBy("id")
        .agg(F.count_distinct("token").alias("n_matched"))
    )
    if mode == "and":
        hits = hits.filter(F.col("n_matched") == len(wanted))
    return hits


def append_to_text_index(
    increment: DataFrame,
    table_prefix: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Add an increment's postings; the bucket layout is preserved
    (``insertInto``), so future searches keep pruning.  The increment
    is tokenized with the INDEX's stored config, not the caller's.

    Consistency: one table write = one job-atomic insert (commit
    protocol) — unlike the MinHash index's three-table append, no
    journal is needed (see ``operators.incremental``)."""
    spark = increment.sparkSession
    meta = spark.table(f"{table_prefix}_ix_meta").first()
    (
        _postings(increment, id_col, text_col, meta["lowercase"])
        .write.insertInto(f"{table_prefix}_ix_postings")
    )


__all__ = ["build_text_index", "search_terms", "append_to_text_index"]
