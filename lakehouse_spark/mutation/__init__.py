"""Mutation layer (SURVEY.md §1.3, SC4/SC5/O9/J4/F2)."""

from lakehouse_spark.mutation import mview, scd, store  # noqa: F401
