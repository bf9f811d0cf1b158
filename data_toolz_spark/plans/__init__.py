"""Logical-plan-side building blocks: the Filter DSL → Column compiler."""

from data_toolz_spark.plans.filtering import Filter, compile_filter

__all__ = ["Filter", "compile_filter"]
