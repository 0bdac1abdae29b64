"""Table loading and catalog registration.

Reads the driver's parquet test tables and registers them as temp views so
both the DataFrame API and ``spark.sql`` paths work. At 100 TB the same entry
points take a directory of partitioned parquet/Delta instead of a single
file — nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = tuple(TESTDATA_TABLES)

# Inferred-schema memo, keyed on (path, mtime_ns, size): footer-based schema
# inference costs ~100 ms of driver time PER spark.read.parquet() call (file
# listing + footer decode in the JVM), paid again on every query build. The
# memo stores the schema Spark itself inferred for exactly these bytes — a
# later read with that schema passed explicitly resolves to the identical
# relation (same types, NTZ/nanos quirks included) without re-reading the
# footer. The stat key invalidates the entry if the table is rewritten.
# Plans/data are NOT cached — only the schema of an immutable file.
_SCHEMA_CACHE: dict[tuple[str, int, int], object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Parquet is self-describing; the explicit schema
    in :mod:`lakehouse_spark.schemas` is the asserted contract (tests check
    parity), not an inference input."""
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # Some testdata generations store events.ts as TIMESTAMP(NANOS), which
        # Spark rejects unless this conf is on. Our own session builder sets
        # it, but callers may hand us a foreign session (e.g. a bare
        # getOrCreate()); the conf is runtime-settable, so set it here where
        # the read happens.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = None  # let spark.read raise its own, richer error
    if key is not None and key in _SCHEMA_CACHE:
        df = spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            _SCHEMA_CACHE[key] = df.schema
    if name == "events":
        # Normalize events.ts to TIMESTAMP (LTZ) regardless of the parquet
        # encoding, so downstream unix_micros/unix_millis/window math always
        # sees one type:
        #   - TIMESTAMP(NANOS) surfaces as bigint via nanosAsLong → truncate
        #     to micros (identical to DuckDB's ns→us cast). `div` = integer
        #     division; float `/` loses precision above 2^53 (epoch-nanos
        #     ≈ 1.7e18) and rounds where DuckDB floors.
        #   - timestamp[us] with no timezone surfaces as TIMESTAMP_NTZ →
        #     wall-clock-as-UTC epoch via timestampdiff on NTZ operands,
        #     then timestamp_micros. Session-timezone-INDEPENDENT: a plain
        #     cast("timestamp") interprets the wall clock in
        #     spark.sql.session.timeZone, so a foreign non-UTC session
        #     would shift every epoch (and DST gaps could corrupt
        #     individual rows); pure NTZ arithmetic can't.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND, "
                        "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                    )
                ),
            )
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Register each table as a temp view named after the table."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
