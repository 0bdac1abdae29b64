"""Scalar function library (SURVEY.md §2.8) + cron scheduling (T10)."""

from lakehouse_spark.functions import cron, scalar  # noqa: F401
