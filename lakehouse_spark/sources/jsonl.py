"""JSONL / JSON-document sources (SURVEY.md SC1/SC2/SC7).

The reference scans append-only JSONL logs line-by-line, skipping blank and
malformed lines and continuing (trace_aggregator.py:82-97, manager.py:327-345
— read, not copied).

Spark mapping: ``read.text`` + ``from_json`` with an EXPLICIT schema — never
inference (a full extra pass at 100 TB, and schema drift breaks
determinism). ``from_json`` returns NULL for unparseable lines, giving the
reference's skip-and-continue semantics as a plain filter, with the skipped
lines countable for data-quality metrics. This shape is preferred over
``spark.read.json``'s ``_corrupt_record`` machinery because (a) Spark
disallows queries that touch only the corrupt column
(QUERY_ONLY_CORRUPT_RECORD_COLUMN), and (b) the identical expression works
under Structured Streaming (`readStream.text` + same projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


_CORRUPT = "__corrupt"


def _parse_lines(raw: DataFrame, schema: StructType) -> DataFrame:
    """line text → (parsed STRUCT, raw line, flags).

    Spark 4's ``from_json`` in PERMISSIVE mode yields an all-NULL struct
    (not a NULL) for malformed input, so corruption is detected the
    documented way: a ``columnNameOfCorruptRecord`` field inside the parse
    schema that carries the raw line iff the parse failed. Blank lines are
    'skippable', non-blank corrupt lines are quarantinable."""
    from pyspark.sql.types import StringType, StructField

    parse_schema = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType())]
    )
    return raw.select(
        F.from_json(
            F.col("value"),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("__parsed"),
        F.col("value").alias("__raw"),
    ).withColumn("__blank", F.trim(F.col("__raw")) == "").withColumn(
        "__bad", F.col("__parsed").isNull() | F.col(f"__parsed.{_CORRUPT}").isNotNull()
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    recursive: bool = False,
) -> DataFrame:
    """SC1: line-delimited JSON scan; blank and malformed lines are skipped
    (the reference's try/except-continue), valid lines become typed rows."""
    reader = spark.read
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    parsed = _parse_lines(reader.text(path), schema)
    return (
        parsed.filter(~F.col("__bad"))
        .select("__parsed.*")
        .drop(_CORRUPT)
    )


def corrupt_lines(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """DQ companion to :func:`read_jsonl`: the raw text of every non-blank
    line a scan skips — quarantine these, don't lose them."""
    parsed = _parse_lines(spark.read.text(path), schema)
    return parsed.filter(
        F.col("__bad") & ~F.col("__blank")
    ).select(F.col("__raw").alias("raw_line"))


def corrupt_line_count(spark: SparkSession, path: str, schema: StructType) -> int:
    """Number of malformed (non-blank, unparseable) lines in the log."""
    return corrupt_lines(spark, path, schema).count()


def read_jsonl_stream(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """SC1 streaming flavor: the same parse over ``readStream.text`` — the
    append-only JSONL directory becomes a live source (SC12)."""
    parsed = _parse_lines(spark.readStream.text(path), schema)
    return parsed.filter(~F.col("__bad")).select("__parsed.*").drop(_CORRUPT)


def read_json_documents(
    spark: SparkSession, path: str, schema: StructType, recursive: bool = False
) -> DataFrame:
    """SC2: whole-file JSON documents (session.json / automation.json style),
    one row per file, with the source path attached for lineage — the Spark
    form of the reference's file-per-entity layout."""
    reader = spark.read.schema(schema).option("multiLine", "true")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.json(path).withColumn("_source_file", F.input_file_name())
