"""Shared Spark fixtures — one session per test run."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_toolz_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# r13 (VERDICT item 2 — the driver's pytest gate no longer completed
# in its capture window): the suite runs on sf0.001 (hundreds of rows
# per table), where per-JOB scheduling dominates — e.g. the gumbel
# law test's single query ran 400 stages × 32 tasks of 3 rows each.
# local[*]=32 threads + 32 shuffle partitions bought nothing at this
# data size and tripled task counts; 8/8 measured ~2× faster on the
# slowest files with identical results (every test is
# partitioning-independent by design — the repartition-invariance
# tests pin that property explicitly with their own counts).  Both
# knobs stay env-overridable for experiments.
TEST_CPUS = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
TEST_SHUFFLE = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8"))


@pytest.fixture(scope="session")
def spark():
    # Per-PROCESS warehouse: the persistent-table tests use fixed
    # table names, so two suites (normal + ANSI) sharing the repo's
    # ./spark-warehouse race on create/drop of identical paths (seen
    # r10: 5+7 metastore failures, all green serially).  A unique
    # warehouse dir + Spark's per-process in-memory catalog fully
    # isolates them — suites can now run CONCURRENTLY.
    warehouse = tempfile.mkdtemp(prefix="dts-test-warehouse-")
    session = get_spark(
        app_name="data_toolz_spark-tests",
        master=f"local[{TEST_CPUS}]",
        shuffle_partitions=TEST_SHUFFLE,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield session
    shutil.rmtree(warehouse, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    import __spark_entry__ as entrymod

    return entrymod.load(spark, sf_dir, "events")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
