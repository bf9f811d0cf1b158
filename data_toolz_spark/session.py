"""SparkSession construction + filesystem configuration helpers.

Replaces the reference's ``datatoolz/filesystem.py`` (FileSystem wrapper
over fsspec local/S3 backends, STS assume-role chains, endpoint
overrides — filesystem.py:20-52,69-107).  On Spark the reader/writer
owns filesystem access through the Hadoop FileSystem API, so the
library's job reduces to *configuration*: build a well-tuned session and
translate the reference's S3 options (role chain, endpoint override)
into ``fs.s3a.*`` settings.

Design notes for scale (100 TB / 1000 executors):
* AQE on by default — runtime partition coalescing + skew-join splitting.
* ``spark.sql.files.maxPartitionBytes`` left at 128m (one task per
  row-group-sized split); shuffle partitions default to a value the
  caller can size to the cluster (AQE coalesces down when small).
* Arrow enabled for the few Pandas-UDF code paths (multimodal decode).
"""

from __future__ import annotations

import os
from typing import Mapping

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: keep predicate pushdown + vectorized reader explicit
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # partition discovery over hive-style field=value dirs
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # session timezone pinned for deterministic timestamp round-trips
    "spark.sql.session.timeZone": "UTC",
    # TIMESTAMP(NANOS) parquet columns (e.g. events.ts) surface as long
    # nanos instead of failing the vectorized reader; loaders convert
    # explicitly (lossless at micro precision) — see sources.io.load_table
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "data_toolz_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: Mapping[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so the
    same entry points run under the driver harness and on a real
    cluster (where ``--master`` comes from spark-submit and this stays
    None).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    for key, value in DEFAULT_CONF.items():
        builder = builder.config(key, value)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def configure_s3(
    spark: SparkSession,
    *,
    endpoint_url: str | None = None,
    path_style_access: bool | None = None,
    assumed_roles: list[str] | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
) -> SparkSession:
    """Translate the reference FileSystem's S3 knobs onto ``fs.s3a.*``.

    Reference parity (datatoolz/filesystem.py):
    * ``endpoint_url`` override (filesystem.py:47-50) →
      ``fs.s3a.endpoint`` (+ path-style access for minio/localstack).
    * STS assume-role *chain* (filesystem.py:69-107): Hadoop's
      ``AssumedRoleCredentialProvider`` handles a single hop natively;
      for a multi-hop chain we pre-resolve credentials driver-side with
      boto3 (each hop's creds feed the next) and inject the final static
      session credentials.  Good for jobs ≤ the STS token lifetime; a
      custom JVM credentials provider is the long-job path (SURVEY
      §7.4.6).
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    if endpoint_url is not None:
        hconf.set("fs.s3a.endpoint", endpoint_url)
        if path_style_access is None:
            path_style_access = True
    if path_style_access is not None:
        hconf.set("fs.s3a.path.style.access", str(path_style_access).lower())

    if assumed_roles:
        access_key, secret_key, session_token = _resolve_role_chain(
            assumed_roles, endpoint_url=endpoint_url
        )
    if access_key is not None:
        hconf.set("fs.s3a.access.key", access_key)
    if secret_key is not None:
        hconf.set("fs.s3a.secret.key", secret_key)
    if session_token is not None:
        hconf.set("fs.s3a.session.token", session_token)
        hconf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
        )
    return spark


def _resolve_role_chain(
    roles: list[str], endpoint_url: str | None = None
) -> tuple[str, str, str]:
    """Walk an STS assume-role chain driver-side; return final creds.

    Mirrors the reference's multi-hop chain (filesystem.py:69-107) where
    each hop's temporary credentials authenticate the next
    ``sts:AssumeRole`` call.  boto3 is imported lazily so local-only
    deployments never need it installed.
    """
    import boto3  # deferred: only needed on the s3 path

    creds: dict[str, str] = {}
    for i, role_arn in enumerate(roles):
        client = boto3.client(
            "sts",
            endpoint_url=endpoint_url,
            aws_access_key_id=creds.get("AccessKeyId"),
            aws_secret_access_key=creds.get("SecretAccessKey"),
            aws_session_token=creds.get("SessionToken"),
        )
        resp = client.assume_role(
            RoleArn=role_arn, RoleSessionName=f"data-toolz-spark-hop-{i}"
        )
        creds = resp["Credentials"]
    return creds["AccessKeyId"], creds["SecretAccessKey"], creds["SessionToken"]
