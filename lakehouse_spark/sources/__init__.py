"""Sources / sinks (SURVEY.md §2.1 SC1-SC12)."""

from lakehouse_spark.sources import (  # noqa: F401
    bucketed,
    files,
    jsonl,
    partitioned,
    refs,
    yamlcfg,
)
