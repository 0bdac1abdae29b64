"""Structured Streaming layer (SURVEY.md §2.10 ST1-ST8)."""

from lakehouse_spark.streaming import live  # noqa: F401
