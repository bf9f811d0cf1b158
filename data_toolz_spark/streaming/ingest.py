"""Streaming ingestion with incremental dedup: the daily-crawl shape.

A document stream lands continuously; every micro-batch must be
deduplicated against EVERYTHING ever ingested before it reaches the
corpus — without rescanning the corpus.  This module wires Structured
Streaming's ``foreachBatch`` to the persistent fingerprint catalog
(``operators.incremental``): per micro-batch, the novel rows are
selected by an anti-join that reads the bucketed catalog in place,
appended to the corpus sink, and their fingerprints folded back into
the catalog — so batch N+1 is deduplicated against batch N's content
automatically.

Semantics and scale notes:

* Work per micro-batch is sized to the batch (the catalog never
  re-shuffles — the same property the batch-mode ``novel_documents``
  plan-asserts).
* ``foreachBatch`` is at-least-once per epoch: on a retry after a
  partial failure, re-selected novel rows either still match (catalog
  append did not land) or anti-join away (it did); the corpus sink
  append CAN duplicate a batch on retry-after-sink-commit — pair with
  an idempotent sink (e.g. overwrite-by-batch-id partitions) when
  exactly-once matters.  Within-batch duplicates collapse to the
  min-id representative before the sink sees them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_toolz_spark.operators.incremental import (
    append_to_catalog,
    novel_documents,
)


def run_dedup_ingest(
    stream_df: DataFrame,
    *,
    catalog_table: str,
    output_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sketch_table: str | None = None,
    index_prefix: str | None = None,
) -> None:
    """Drain the available stream backlog into a deduplicated corpus.

    Per micro-batch: anti-join against ``catalog_table`` (which must
    exist — build it with :func:`build_fingerprint_catalog
    <data_toolz_spark.operators.incremental.build_fingerprint_catalog>`,
    possibly over an empty frame), append the novel rows (original
    columns) to ``output_path`` as parquet, fold their fingerprints
    into the catalog.  ``availableNow`` drains then stops — rerun per
    ingestion cycle; the checkpoint carries source offsets so replayed
    files are never re-read.

    ``sketch_table`` (optional) appends one HLL sketch row per batch —
    ``(batch_id, n_rows, sketch)`` over the novel ids — so "how many
    distinct documents has this corpus ever ingested" is a
    ``rollup_sketches`` over the tiny stats table, never a corpus
    scan (see ``functions.sketches``).  Like the sink append, the
    stats row is at-least-once on epoch retry; HLL union makes a
    replayed row idempotent in the ESTIMATE (same ids fold to the
    same sketch), only ``n_rows`` can double-count a retried batch.

    ``index_prefix`` (optional) folds each batch's novel documents
    into an existing inverted text index (``operators.search``) —
    searchable the moment they land, postings sized to the batch.  A
    replayed epoch can duplicate posting rows; searches stay correct
    (``count_distinct`` semantics), run ``compact_dataset`` or a
    periodic ``distinct`` rewrite to reclaim the space.
    """
    in_cols = stream_df.columns

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        novel = novel_documents(
            spark,
            batch_df,
            catalog_table,
            text_col=text_col,
            id_col=id_col,
        )
        # one pass over the anti-join result feeds all writes.  The
        # catalog fold must come LAST: insertInto invalidates every
        # cached plan referencing the catalog table — including
        # ``novel`` itself — and a consumer running after the fold
        # would re-evaluate the anti-join against the UPDATED catalog
        # and see zero novel rows.
        novel = novel.persist()
        try:
            novel.select(*in_cols).write.mode("append").parquet(output_path)
            if sketch_table:
                from data_toolz_spark.functions.sketches import hll_sketch

                (
                    novel.agg(
                        F.count(F.lit(1)).alias("n_rows"),
                        hll_sketch(id_col).alias("sketch"),
                    )
                    .withColumn("batch_id", F.lit(batch_id))
                    .select("batch_id", "n_rows", "sketch")
                    .write.mode("append")
                    .saveAsTable(sketch_table)
                )
            if index_prefix:
                from data_toolz_spark.operators.search import (
                    append_to_text_index,
                )

                append_to_text_index(
                    novel,
                    index_prefix,
                    id_col=id_col,
                    text_col=text_col,
                )
            append_to_catalog(novel, catalog_table, id_col=id_col)
        finally:
            novel.unpersist()

    query = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


__all__ = ["run_dedup_ingest"]
