"""Round-12 verdict ask #2: detect-and-raise for the Spark 4.1 pushFilters
aliasing hazard (sources/table_source.py module docstring). The JVM caches
the planned Python data-source read per relation UNKEYED by pushed
filters, so reusing ONE loaded DataFrame across scans with different
filter sets silently executes the wrong partitions. The reader now pins
the first pushed-filter signature per RELATION (a token stamped at
DataSource construction, i.e. per .load(), backed by a cross-worker
tmpdir sidecar because Spark pools planner workers) and raises with the
fresh-load instruction on a second, different application.
"""

from __future__ import annotations

import json

import pytest

from lakehouse_spark.mutation.store import TableStore
from lakehouse_spark.sources.table_source import (
    LakehouseDataSource,
    _effective_filters_sig,
    _pin_pushed_sig,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakehouseDataSource)


@pytest.fixture()
def root(spark, tmp_path):
    r = str(tmp_path / "t")
    st = TableStore(spark, r, key="id", stats_cols=("id",))
    st.init(spark.range(100).selectExpr("id", "id AS x"))
    return r


def _assert_guard(excinfo):
    assert "DIFFERENT filter" in str(excinfo.value)
    assert "fresh" in str(excinfo.value) or "load(" in str(excinfo.value)


def test_reused_relation_different_filters_raises(spark, root):
    """The previously-silent pattern: one relation, two filter sets. The
    second scan used to run with poisoned shared plan state; it now fails
    loudly with the fresh-load instruction."""
    df = spark.read.format("lakehouse").load(root)
    assert df.filter("id < 10").count() == 10
    with pytest.raises(Exception) as ex:
        df.filter("id >= 50").count()
    _assert_guard(ex)


def test_unfiltered_then_filtered_reuse_raises(spark, root):
    """Planning with no pushed filters pins the empty signature, so a
    later filtered push on the same relation (which would poison the
    cached unfiltered plan for re-execution) raises too."""
    df = spark.read.format("lakehouse").load(root)
    assert df.count() == 100
    with pytest.raises(Exception) as ex:
        df.filter("id < 10").count()
    _assert_guard(ex)


def test_self_join_different_side_filters_raises(spark, root):
    """A self-join over ONE relation with different per-side filters runs
    the last-pushed side's filter on both sides upstream — now raises."""
    df = spark.read.format("lakehouse").load(root)
    left = df.filter("id < 10").alias("l")
    right = df.filter("id >= 90").alias("r")
    with pytest.raises(Exception) as ex:
        left.crossJoin(right).count()
    _assert_guard(ex)


def test_fresh_load_per_query_stays_fine(spark, root):
    """The documented-correct pattern must not be affected: fresh
    .load() per query, any mix of filters."""
    assert spark.read.format("lakehouse").load(root).count() == 100
    assert (
        spark.read.format("lakehouse").load(root).filter("id < 10").count()
        == 10
    )
    assert (
        spark.read.format("lakehouse").load(root).filter("id >= 50").count()
        == 50
    )


def test_same_plan_replay_and_same_filter_self_join_fine(spark, root):
    """Re-executing the SAME plan (count then collect), and a self-join
    whose both sides carry the identical filter, pin identical signatures
    — legal."""
    df = spark.read.format("lakehouse").load(root).filter("id < 7")
    assert df.count() == 7
    assert len(df.collect()) == 7
    df2 = spark.read.format("lakehouse").load(root)
    k = df2.filter("id < 5")
    assert k.alias("a").crossJoin(k.alias("b")).count() == 25


def test_option_pinned_relation_reuse_safe(spark, root):
    """A .option('predicate', ...) relation declines all pushed filters
    (its planned read is identical for every query), so mixed per-query
    filters on ONE relation stay legal and exact."""
    df = (
        spark.read.format("lakehouse")
        .option("predicate", json.dumps({"id": {"between": [0, 49]}}))
        .load(root)
    )
    assert df.filter("id < 10").count() == 10
    assert df.count() == 50
    assert df.filter("id >= 20").count() == 30


def test_non_narrowing_filters_reuse_fine(spark, tmp_path):
    """Filters the reader DECLINES entirely (LIKE and friends) leave the
    planned read identical to unfiltered, so mixing them across one
    relation is reuse-safe and must not raise (Spark applies them
    per-query plan-side)."""
    r = str(tmp_path / "nn")
    st = TableStore(spark, r, key="id", stats_cols=("id",))
    st.init(
        spark.range(20).selectExpr(
            "id", "concat('tag', CAST(id % 3 AS STRING)) AS tag"
        )
    )
    df = spark.read.format("lakehouse").load(r)
    assert df.filter("tag LIKE 'tag1%'").count() == 7
    assert df.filter("tag LIKE 'tag2%'").count() == 6
    assert df.count() == 20
    # ...but a NARROWING filter after those still raises (it would poison
    # the cached unfiltered partitions).
    with pytest.raises(Exception) as ex:
        df.filter("id < 5").count()
    _assert_guard(ex)


def test_pin_helper_unit():
    """_pin_pushed_sig contract: None token is a no-op; same sig re-pins
    quietly; different sig raises."""
    import uuid

    _pin_pushed_sig(None, ())
    tok = uuid.uuid4().hex
    sig = _effective_filters_sig([], set(), {})
    _pin_pushed_sig(tok, sig)
    _pin_pushed_sig(tok, sig)  # idempotent
    with pytest.raises(RuntimeError, match="DIFFERENT filter"):
        _pin_pushed_sig(tok, (("EqualTo", ("id",), "1"),))


def test_pin_survives_fresh_registry(tmp_path):
    """The tmpdir sidecar makes the pin visible to a planner worker whose
    in-process registry never saw the first pin (worker pooling)."""
    import uuid

    from lakehouse_spark.sources import table_source as TS

    tok = uuid.uuid4().hex
    _pin_pushed_sig(tok, (("EqualTo", ("id",), "1"),))
    TS._PUSHED_SIG.pop(tok, None)  # simulate a different worker process
    with pytest.raises(RuntimeError, match="DIFFERENT filter"):
        _pin_pushed_sig(tok, (("EqualTo", ("id",), "2"),))


def test_pin_file_roundtrip_nonempty_sig():
    """A non-empty signature must survive the tmpdir sidecar round-trip
    byte-identically — a serde mismatch would make the cross-worker layer
    raise on IDENTICAL replays (round-12 pass-2 finding #1: the old
    deserializer exploded the column-name string into a char tuple)."""
    import uuid

    from lakehouse_spark.sources import table_source as TS

    tok = uuid.uuid4().hex
    sig = (("EqualTo", "id", "5"), ("IsNotNull", "tag", ""))
    _pin_pushed_sig(tok, sig)
    TS._PUSHED_SIG.pop(tok, None)  # force the file-read path
    _pin_pushed_sig(tok, sig)  # identical replay: must NOT raise
    TS._PUSHED_SIG.pop(tok, None)
    with pytest.raises(RuntimeError, match="DIFFERENT filter"):
        _pin_pushed_sig(tok, (("EqualTo", "id", "6"),))
