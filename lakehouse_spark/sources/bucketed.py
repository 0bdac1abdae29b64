"""Bucketed table layout: shuffle-free co-located joins (engine addition;
SURVEY.md §4 physical-layout notes).

The reference keeps every entity in its own file and never joins at scale;
a 100 TB deployment joining `events`/`sessions`-sized tables on the same key
in query after query should NOT pay a hash-repartition per query. Spark's
answer is bucketing: write both tables pre-hashed into the same number of
buckets on the join key, and every subsequent equi join on that key reads
co-located buckets — the executed plan shows SortMergeJoin with NO Exchange
on either side. The shuffle is paid ONCE at write time, amortized over every
downstream join/aggregation on the bucket key.

Notes for real deployments:
- bucket counts must match on both sides (or be a multiple with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` on the bucket key additionally removes the per-task Sort from
  the merge join;
- in this container the table metadata lives in the session's in-memory
  catalog (no Hive metastore); the parquet layout on disk is identical to
  what a metastore-backed cluster produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table registered as
    ``table_name``. ``path`` makes it an external table (required when the
    caller owns the directory, e.g. tests writing under tmp dirs)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Equi join of two tables bucketed on the join key: Catalyst sees both
    sides' hash distribution from the bucket spec and plans the join with no
    Exchange. The join itself is a plain ``DataFrame.join`` — this helper
    only documents + centralizes the pattern (and the plan test pins it)."""
    return spark.table(left_table).join(spark.table(right_table), on)
