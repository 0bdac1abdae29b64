"""CSV/TSV source with the same skip-and-quarantine contract as the JSONL
scan (sources/jsonl.py): explicit schema (no inference pass), malformed
rows filtered out of the typed result but recoverable for data quality,
and an identical expression usable under Structured Streaming.

Spark mapping: ``read.text`` + ``from_csv`` — mirrors the from_json shape
rather than ``spark.read.csv``'s ``_corrupt_record`` machinery for the
same two reasons (corrupt-only queries are rejected; streaming parity).
A header line, if present, parses as corrupt under a typed schema and is
dropped by the same filter — pass ``skip_header=True`` to assert that
explicitly instead of relying on the type mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "__corrupt"


def _parse(raw: DataFrame, schema: StructType, sep: str) -> DataFrame:
    parse_schema = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType())]
    )
    return raw.select(
        F.from_csv(
            F.col("value"),
            parse_schema.simpleString(),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": _CORRUPT,
                "sep": sep,
            },
        ).alias("__parsed"),
        F.col("value").alias("__raw"),
    ).withColumn("__blank", F.trim(F.col("__raw")) == "").withColumn(
        "__bad",
        F.col("__parsed").isNull()
        | F.col(f"__parsed.{_CORRUPT}").isNotNull(),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    skip_header: bool = False,
) -> DataFrame:
    """Typed CSV scan: blank and malformed lines skipped, header line (when
    declared) dropped by exact match against the schema's column names."""
    raw = spark.read.text(path)
    if skip_header:
        header = sep.join(f.name for f in schema.fields)
        raw = raw.filter(F.col("value") != header)
    parsed = _parse(raw, schema, sep)
    # __blank filtered explicitly: unlike from_json, from_csv parses an
    # empty line "successfully" into an all-null row instead of flagging it
    return (
        parsed.filter(~F.col("__bad") & ~F.col("__blank"))
        .select("__parsed.*")
        .drop(_CORRUPT)
    )


def corrupt_rows(
    spark: SparkSession, path: str, schema: StructType, sep: str = ","
) -> DataFrame:
    """Quarantine view: raw text of every non-blank row the scan skips."""
    parsed = _parse(spark.read.text(path), schema, sep)
    return parsed.filter(F.col("__bad") & ~F.col("__blank")).select(
        F.col("__raw").alias("raw_line")
    )


def read_csv_stream(
    spark: SparkSession, path: str, schema: StructType, sep: str = ","
) -> DataFrame:
    """Streaming flavor: the same parse over readStream.text."""
    parsed = _parse(spark.readStream.text(path), schema, sep)
    return (
        parsed.filter(~F.col("__bad") & ~F.col("__blank"))
        .select("__parsed.*")
        .drop(_CORRUPT)
    )
