"""Date-partitioned parquet layout + partition pruning (engine addition;
SURVEY.md §4 physical-layout notes).

The reference stores one JSONL file per session; a 100 TB event log lives as
``events/event_date=YYYY-MM-DD/part-*.parquet``. Writing through
:func:`write_partitioned` buys two things every time-ranged query needs:

- **partition pruning**: a filter on the partition column eliminates whole
  directories at PLANNING time — the scan's ``PartitionFilters`` shows the
  pruned predicate and untouched dates are never listed, opened, or read;
- **dynamic partition overwrite**: re-ingesting one day replaces only that
  day's directory (``partitionOverwriteMode=dynamic``), the idempotent
  backfill primitive.

Partition columns should be LOW cardinality (a date: ~365 dirs/year).
Partitioning by a high-cardinality key (session_id!) creates millions of
tiny files — that key belongs in bucketing (sources/bucketed.py) or plain
data columns with parquet min/max stats instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    derive_from: Column | str | None = None,
    overwrite_dynamic: bool = False,
) -> None:
    """Write ``df`` partitioned by ``partition_col``. ``derive_from`` adds
    the partition column first (e.g. ``F.to_date("ts")``) so callers don't
    leak a derived column into their schema. ``overwrite_dynamic`` replaces
    only the partitions present in ``df`` (idempotent daily backfill)."""
    if derive_from is not None:
        src = F.col(derive_from) if isinstance(derive_from, str) else derive_from
        df = df.withColumn(partition_col, src)
    writer = df.write.partitionBy(partition_col)
    if overwrite_dynamic:
        writer = writer.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        )
    else:
        writer = writer.mode("overwrite")
    writer.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back; filters on the partition column prune
    at planning time (check ``PartitionFilters`` in the scan)."""
    return spark.read.parquet(path)
