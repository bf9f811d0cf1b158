"""data_toolz_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``grzegorzme/data-toolz`` (reference surveyed in SURVEY.md):

* ``sources``   — DataIO: parquet / dsv / jsonlines read+write, gzip,
                  hive-style partitioned and chunked output
                  (reference: datatoolz/io.py).
* ``plans``     — the Filter predicate DSL compiled to a single
                  ``pyspark.sql.Column`` boolean expression so Catalyst
                  can codegen + push it down
                  (reference: datatoolz/filtering.py).
* ``functions`` — JVM-side column function library (vector math, text
                  metrics) used by the extension operators.
* ``operators`` — large-scale LLM-data-pipeline operators: dedup
                  (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                  embedding-cosine), similarity search, text analysis,
                  window analytics, as-of joins, multimodal columns.
* ``streaming`` — Structured Streaming variants over the events table.
* ``fs``        — driver-side file utilities (ls/rm/cp/sign/…) over the
                  Hadoop FileSystem (reference: datatoolz/filesystem.py
                  delegates).
* ``logging``   — JSON structured logger + instrumentation decorator
                  (reference: datatoolz/logging.py).

Everything is DataFrame-first: logical plans are declared through the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.
"""

from data_toolz_spark.session import (
    S3CredentialRefresher,
    configure_s3,
    get_spark,
)
from data_toolz_spark.plans.filtering import Filter, compile_filter
from data_toolz_spark.sources.io import DataIO
from data_toolz_spark.sources.maintenance import (
    assert_append_compatible,
    column_profile,
    compact_dataset,
    dataset_stats,
    schema_problems,
    zorder_write,
)
from data_toolz_spark.fs import FsUtil
from data_toolz_spark.logging import JsonLogger
from data_toolz_spark.catalog import register_dataset, register_directory
from data_toolz_spark.pipelines import prepare_training_corpus

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "configure_s3",
    "S3CredentialRefresher",
    "Filter",
    "compile_filter",
    "DataIO",
    "compact_dataset",
    "dataset_stats",
    "zorder_write",
    "schema_problems",
    "assert_append_compatible",
    "column_profile",
    "FsUtil",
    "JsonLogger",
    "register_dataset",
    "register_directory",
    "prepare_training_corpus",
]
