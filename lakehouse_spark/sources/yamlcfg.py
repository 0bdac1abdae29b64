"""YAML config source (SURVEY.md §2.1 SC3).

The reference reads profile.yaml / behavior.yaml / daemon.yaml as plain
config documents (routers/sessions.py:156-196, startup/__init__.py:109-192
— read, not copied). Spark has no YAML source; config documents are
driver-side by nature (tens of files, not tables), so this parses with
PyYAML and surfaces rows via createDataFrame — gated so environments
without yaml degrade with a clear error instead of an import crash.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

try:
    import yaml

    HAS_YAML = True
except ImportError:  # pragma: no cover - environment-dependent
    HAS_YAML = False


def read_yaml_documents(
    spark: SparkSession, pattern: str, schema: StructType | str
) -> DataFrame:
    """SC3: one row per YAML document matching ``pattern`` (glob), with a
    `_source_file` lineage column. Documents must be mappings; the explicit
    schema selects/types the fields (never inferred, like every other
    source here). Malformed files are skipped, matching the JSONL sources'
    skip-and-continue posture."""
    if not HAS_YAML:
        raise ImportError(
            "pyyaml not available: install it or pre-convert configs to JSON "
            "(sources.jsonl.read_json_documents)"
        )
    rows = []
    field_names = None
    for path in sorted(glob.glob(pattern, recursive=True)):
        try:
            with open(path) as f:
                doc = yaml.safe_load(f)
        except (yaml.YAMLError, OSError):
            continue
        if not isinstance(doc, dict):
            continue
        doc["_source_file"] = os.path.abspath(path)
        rows.append(doc)
    if isinstance(schema, StructType):
        field_names = [f.name for f in schema.fields]
    if field_names is not None:
        rows = [{k: r.get(k) for k in field_names} for r in rows]
    return spark.createDataFrame(rows, schema)
