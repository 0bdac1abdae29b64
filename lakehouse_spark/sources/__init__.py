"""Sources / sinks (SURVEY.md §2.1 SC1-SC12)."""

from lakehouse_spark.sources import bucketed, files, jsonl, refs, yamlcfg  # noqa: F401
