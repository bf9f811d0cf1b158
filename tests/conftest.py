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
        master="local[*]",
        shuffle_partitions=32,
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
