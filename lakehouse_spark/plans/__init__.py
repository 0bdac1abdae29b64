"""Iterative / recursive plan helpers (SURVEY.md J3/J4/J8/J9)."""

from lakehouse_spark.plans import closure  # noqa: F401
