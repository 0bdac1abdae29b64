"""Regression: load_table must work under a session we did not build.

Round-1 CORRECTNESS ran the catalog under the driver's own SparkSession,
which lacked ``spark.sql.legacy.parquet.nanosAsLong`` — every events.parquet
read died with PARQUET_TYPE_ILLEGAL. load_table now sets the conf at the
read site, so a foreign session (simulated with newSession + conf unset)
must succeed too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_events_read_under_foreign_session(spark):
    foreign = spark.newSession()
    # Simulate a driver-built session: the legacy-nanos conf is absent.
    foreign.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = load_table(foreign, SF, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(5).count() > 0


def test_events_ts_values_match_between_sessions(spark):
    ours = load_table(spark, SF, "events")
    foreign = spark.newSession()
    foreign.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    theirs = load_table(foreign, SF, "events")
    a = ours.agg(F.min("ts"), F.max("ts"), F.count("*")).collect()[0]
    b = theirs.agg(F.min("ts"), F.max("ts"), F.count("*")).collect()[0]
    assert tuple(a) == tuple(b)
