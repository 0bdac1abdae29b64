"""Operator inventory (SURVEY.md §2), expressed Spark-first.

Every public function here is a declarative DataFrame→DataFrame transform —
Catalyst sees the whole plan (pushdown, pruning, join selection, AQE all
apply). Only the genuinely stateful operators (marker sessionization) drop
to `applyInPandas`.
"""

from lakehouse_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    filters,
    joins,
    multimodal,
    sessionize,
    similarity,
    sorts,
    text,
)
