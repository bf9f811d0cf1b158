"""Catalog helpers: path-prefix datasets as named SQL views.

The reference has no table concept — a "table" is a path prefix
(datatoolz/io.py:102-147).  On Spark the natural upgrade is a view
registry: point the engine at a directory of datasets once, then every
query surface (DataFrame, ``spark.sql``, the Filter DSL) sees named
tables, with Catalyst handling pruning/pushdown identically across all
of them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def register_dataset(
    spark: SparkSession,
    name: str,
    path: str,
    filetype: str = "parquet",
    **read_kwargs,
) -> DataFrame:
    """Register one path-prefix dataset as a temp view named ``name``."""
    from data_toolz_spark.sources.io import DataIO

    df = DataIO().read(spark, path, filetype=filetype, **read_kwargs)
    df.createOrReplaceTempView(name)
    return df


def register_directory(
    spark: SparkSession,
    directory: str,
    *,
    suffix: str = ".parquet",
) -> list[str]:
    """Register every ``<name><suffix>`` dataset under ``directory`` as a
    view named ``<name>`` — one call makes a test-data dir SQL-queryable.
    """
    names = []
    for entry in sorted(os.listdir(directory)):
        if entry.endswith(suffix):
            name = entry[: -len(suffix)]
            spark.read.parquet(os.path.join(directory, entry)).createOrReplaceTempView(
                name
            )
            names.append(name)
    return names


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run ANSI SQL against the registered views (thin passthrough)."""
    return spark.sql(query)


def drop_stale_table(spark: SparkSession, table: str) -> None:
    """Make ``saveAsTable(mode='overwrite')`` of a MANAGED table
    idempotent across SESSIONS: with an in-memory catalog, a table
    directory left by a previous process is invisible to DROP TABLE
    but still blocks the new write with LOCATION_ALREADY_EXISTS — so
    drop the catalog entry AND clear a stale local warehouse dir.
    Non-local warehouses are left to the catalog."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        from urllib.parse import unquote, urlparse

        wh = unquote(urlparse(wh).path)
    if "://" in wh:
        return
    import os
    import shutil

    shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)


__all__ = [
    "register_dataset",
    "register_directory",
    "sql",
    "drop_stale_table",
]
