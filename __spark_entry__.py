"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke check, sf0.001).
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness
gate.  Column names/aliases match between both sides by construction.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_toolz_spark.plans.filtering import Filter

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), read as long nanos via
        # spark.sql.legacy.parquet.nanosAsLong; micro precision verified
        # lossless on the driver tables
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


# ---------------------------------------------------------------------------
# flagship: TPC-H-Q1-shaped pricing summary, driven through the Filter DSL
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → compiled-DSL filter → hash aggregate.

    Exercises S1 (parquet scan), F1/F3/F4 (the predicate compiler with
    pushdown into the scan), and R2-style aggregation (SURVEY §2.1/2.4).
    """
    lineitem = load(spark, sf_dir, "lineitem")
    flt = Filter(
        [
            {
                "l_quantity": [{"numeric": ["<=", 45]}],
                "l_returnflag": [{"anything-but": ["X"]}],
            }
        ]
    )
    return (
        flt.apply(lineitem)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                            AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                       AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
  ROUND(AVG(l_quantity), 4)                            AS avg_qty,
  ROUND(AVG(l_discount), 4)                            AS avg_disc,
  COUNT(*)                                             AS count_order
FROM lineitem
WHERE l_quantity <= 45 AND l_returnflag <> 'X'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# scans / relational parity qids (SURVEY §2.1, §2.3)
# ---------------------------------------------------------------------------


def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: raw parquet scan with column pruning (2-col ReadSchema)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def part_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: distinct partition tuples (reference get_partitions groupby)."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


def agg_partition_rowcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: per-partition row counts (reference partition sizing)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def proj_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: column projection via drop (reference drop_partitions)."""
    lineitem = load(spark, sf_dir, "lineitem")
    keep_away = [
        c
        for c in lineitem.columns
        if c not in ("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    ]
    return lineitem.drop(*keep_away).drop("l_shipdate")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "scan_parquet": scan_parquet,
        "part_distinct": part_distinct,
        "agg_partition_rowcounts": agg_partition_rowcounts,
        "proj_drop_columns": proj_drop_columns,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": Q1_ORACLE,
        "scan_parquet": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
        ),
        "part_distinct": (
            "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
        ),
        "agg_partition_rowcounts": (
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "proj_drop_columns": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
        ),
    }
