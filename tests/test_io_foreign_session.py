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


def test_events_ts_is_ltz_timestamp_at_every_sf(spark):
    # The driver's testdata has shipped events.ts as both TIMESTAMP(NANOS)
    # (round 1) and timestamp[us] without timezone (round 2 — Spark reads
    # TIMESTAMP_NTZ). load_table must normalize BOTH encodings to TIMESTAMP
    # (LTZ): unix_micros/unix_millis in w2/w3/s2 reject TIMESTAMP_NTZ.
    import os

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", sf
        # unix_micros is the call sites' actual requirement — exercise it.
        assert df.select(F.unix_micros("ts")).limit(1).count() == 1, sf


def test_events_ts_epoch_is_session_timezone_independent(spark):
    """The NTZ parquet encoding stores a wall clock; load_table must anchor
    it to UTC regardless of the session's spark.sql.session.timeZone. A
    plain cast("timestamp") would shift every epoch by the foreign zone's
    offset (and mangle rows landing in DST gaps); the timestampdiff form
    cannot. Pins the engine's documented UTC assumption for wall-clock-
    shifted FOREIGN sessions, not just foreign conf sets."""
    ours = load_table(spark, SF, "events").agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
        F.sum(F.unix_micros("ts")).alias("s"),
    ).collect()[0]

    foreign = spark.newSession()
    prev = foreign.conf.get("spark.sql.session.timeZone")
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        theirs = load_table(foreign, SF, "events").agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
            F.sum(F.unix_micros("ts")).alias("s"),
        ).collect()[0]
    finally:
        foreign.conf.set("spark.sql.session.timeZone", prev)
    assert tuple(ours) == tuple(theirs)
