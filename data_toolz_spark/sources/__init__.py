"""Dataset sources & sinks: the DataIO read/write surface."""

from data_toolz_spark.sources.io import DataIO

__all__ = ["DataIO"]
