"""The backend contract suite (mutation/backend.py): ten behavioral
clauses any versioned-table engine must pass to be swappable behind the
pipelines. Parameterized over every binding in ALL_BACKENDS — TableStore
runs here; the Delta binding runs verbatim wherever delta-spark is
installed and records an explicit skip in this container."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from lakehouse_spark.mutation.backend import ALL_BACKENDS


@pytest.fixture(params=ALL_BACKENDS, ids=lambda b: b.__name__)
def backend(request, spark, tmp_path):
    cls = request.param
    if not cls.available():
        pytest.skip(f"{cls.__name__}: engine not installed in this container")
    b = cls(spark, str(tmp_path / "tbl"), key="id")
    b.create(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, v string, x long",
        )
    )
    return b


def _rows(df):
    return sorted((r.id, r.v, r.x) for r in df.select("id", "v", "x").collect())


def test_create_read_roundtrip(backend):  # clause 1
    assert _rows(backend.read()) == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    assert dict(backend.read().dtypes)["v"] == "string"


def test_append_is_additive_and_versioned(backend, spark):  # clause 2
    v0 = backend.current_version()
    backend.append(
        spark.createDataFrame([(4, "d", 40)], "id long, v string, x long")
    )
    assert backend.current_version() == v0 + 1
    assert _rows(backend.read()) == [
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
    ]


def test_upsert_updates_matched_inserts_unmatched(backend, spark):  # clause 3
    backend.upsert(
        spark.createDataFrame(
            [(2, "B", 21), (9, "i", 90)], "id long, v string, x long"
        )
    )
    got = _rows(backend.read())
    assert got == [(1, "a", 10), (2, "B", 21), (3, "c", 30), (9, "i", 90)]
    # never duplicates: one row per key however often the upsert repeats
    backend.upsert(
        spark.createDataFrame([(9, "I", 91)], "id long, v string, x long")
    )
    assert backend.read().groupBy("id").count().filter("count > 1").count() == 0


def test_delete_removes_exactly_named_keys(backend, spark):  # clause 4
    backend.delete_keys(spark.createDataFrame([(2,), (999,)], "id long"))
    assert _rows(backend.read()) == [(1, "a", 10), (3, "c", 30)]


def test_version_time_travel(backend, spark):  # clause 5
    v0 = backend.current_version()
    snap0 = _rows(backend.read())
    backend.append(
        spark.createDataFrame([(4, "d", 40)], "id long, v string, x long")
    )
    backend.upsert(
        spark.createDataFrame([(1, "A", 11)], "id long, v string, x long")
    )
    assert _rows(backend.read(version=v0)) == snap0
    assert (1, "A", 11) in _rows(backend.read())


def test_timestamp_time_travel(backend, spark):  # clause 6
    snap0 = _rows(backend.read())
    time.sleep(1.1)  # Delta resolves timestampAsOf at second granularity
    ts = time.time()
    time.sleep(1.1)
    backend.append(
        spark.createDataFrame([(4, "d", 40)], "id long, v string, x long")
    )
    from datetime import datetime, timezone

    as_of = datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    assert _rows(backend.read(as_of=as_of)) == snap0


def test_change_feed_composes_any_snapshot(backend, spark):  # clause 7
    backend.append(
        spark.createDataFrame([(4, "d", 40)], "id long, v string, x long")
    )
    backend.upsert(
        spark.createDataFrame([(1, "A", 11)], "id long, v string, x long")
    )
    backend.delete_keys(spark.createDataFrame([(3,)], "id long"))
    ch = backend.changes(0)
    assert set(ch.columns) >= {"_change_type", "_commit_version", "id", "v", "x"}
    kinds = {r["_change_type"] for r in ch.select("_change_type").distinct().collect()}
    assert kinds <= {
        "insert", "update_preimage", "update_postimage", "delete",
    }
    # replaying the feed reproduces HEAD: inserts+postimages minus
    # (preimages and deletes), keyed by (id, version recency)
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("_commit_version"))
    last = (
        ch.filter(
            F.col("_change_type").isin("insert", "update_postimage", "delete")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .filter(F.col("_change_type") != "delete")
    )
    assert _rows(last) == _rows(backend.read())


def test_history_lists_versions_newest_first(backend, spark):  # clause 8
    backend.append(
        spark.createDataFrame([(4, "d", 40)], "id long, v string, x long")
    )
    h = backend.history()
    versions = [e["version"] for e in h]
    assert versions == sorted(versions, reverse=True)
    assert versions[0] == backend.current_version()
    assert all("timestamp" in e for e in h)


def test_type_conflicting_append_rejected(backend, spark):  # clause 9
    before = _rows(backend.read())
    bad = spark.createDataFrame(
        [(5, "e", "not-a-number")], "id long, v string, x string"
    )
    with pytest.raises(Exception):
        backend.append(bad)
    assert _rows(backend.read()) == before  # table untouched


def test_delete_where_is_row_exact(backend, spark):  # clause 10
    backend.append(
        spark.createDataFrame([(4, "d", 25)], "id long, v string, x long")
    )
    backend.delete_where("x > 20")
    assert _rows(backend.read()) == [(1, "a", 10), (2, "b", 20)]
