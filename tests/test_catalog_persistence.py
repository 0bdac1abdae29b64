"""Round-10 verdict #6: catalog registry persistence.

LakeCatalog.save(path)/load(spark, path): store-backed registrations
(names, roots, keys, store config, version/as_of pins, predicates,
change-feed ranges, follow_head) survive a session restart — the
reference persists its name→entity index the same way
(amplifier_library/sessions/manager.py:546-566).
"""

from __future__ import annotations

import pytest

from lakehouse_spark.catalog import LakeCatalog
from lakehouse_spark.mutation.store import TableStore


def _mk(spark, path, n=100):
    st = TableStore(
        spark, str(path), key="id", stats_cols=("x",), write_cdf=True
    )
    st.init(spark.range(n).selectExpr("id", "id AS x"))
    st.append(spark.range(n, n + 50).selectExpr("id", "id AS x"))
    return st


def test_register_save_load_sql_works(spark, tmp_path):
    st = _mk(spark, tmp_path / "t")
    cat = LakeCatalog(spark)
    cat.register("events", store=st, follow_head=True)
    cat.register("hot", store=st, predicate={"x": (100, None)})
    cat.register("frozen", store=st, version=0)
    cat.register("feed", store=st, changes=True)
    cat.register("scratch", df=spark.range(3))  # not persistable: skipped
    reg = str(tmp_path / "registry.json")
    assert cat.save(reg) == 4

    # "New session": a fresh catalog object with no shared state.
    cat2 = LakeCatalog.load(spark, reg)
    assert cat2.sql("SELECT count(*) AS n FROM events").collect()[0].n == 150
    assert cat2.sql("SELECT count(*) AS n FROM hot").collect()[0].n == 50
    assert cat2.sql("SELECT count(*) AS n FROM frozen").collect()[0].n == 100
    # Change-feed view round-trips with its range semantics.
    assert (
        cat2.sql(
            "SELECT count(*) AS n FROM feed WHERE _change_type = 'insert'"
        ).collect()[0].n
        == 150
    )
    # follow_head survived: a commit through one catalog is visible via
    # the other's follower on the next query.
    st.append(spark.range(150, 160).selectExpr("id", "id AS x"))
    assert cat2.sql("SELECT count(*) AS n FROM events").collect()[0].n == 160
    # The df-backed view was skipped (no durable identity to persist);
    # it survives here only as this session's temp view, not registry
    # state. (tmp views are session-scoped, so a REAL new session would
    # not see it at all.)
    assert "scratch" not in cat2._entries


def test_loaded_pinned_registration_still_refuses_dml(spark, tmp_path):
    st = _mk(spark, tmp_path / "t")
    cat = LakeCatalog(spark)
    cat.register("frozen", store=st, version=0)
    cat.register("live", store=st)
    reg = str(tmp_path / "registry.json")
    cat.save(reg)
    cat2 = LakeCatalog.load(spark, reg)
    with pytest.raises(ValueError, match="pinned"):
        cat2.sql("DELETE FROM frozen WHERE id = 1")
    # The unpinned name mutates fine, with the saved store config (CDF
    # stays on: the delete materializes change rows).
    res = cat2.sql("DELETE FROM live WHERE id = 1").collect()[0]
    assert res.affected_rows == 1
    v = st.current_version()
    assert any(
        r._change_type == "delete" for r in st.changes(v, v).collect()
    )


def test_load_missing_root_raises_by_name(spark, tmp_path):
    st = _mk(spark, tmp_path / "t")
    cat = LakeCatalog(spark)
    cat.register("doomed", store=st)
    reg = str(tmp_path / "registry.json")
    cat.save(reg)
    import shutil

    shutil.rmtree(st.root)
    with pytest.raises(FileNotFoundError, match="doomed"):
        LakeCatalog.load(spark, reg)


def test_predicate_kinds_round_trip(spark, tmp_path):
    st = _mk(spark, tmp_path / "t")
    cat = LakeCatalog(spark)
    cat.register("rng", store=st, predicate={"x": (10, 19)})
    cat.register("inset", store=st, predicate={"x": [5, 7]})
    cat.register("eq", store=st, predicate={"x": 3})
    reg = str(tmp_path / "registry.json")
    cat.save(reg)
    cat2 = LakeCatalog.load(spark, reg)
    assert cat2.sql("SELECT count(*) AS n FROM rng").collect()[0].n == 10
    assert cat2.sql("SELECT count(*) AS n FROM inset").collect()[0].n == 2
    assert cat2.sql("SELECT count(*) AS n FROM eq").collect()[0].n == 1


def test_datetime_as_of_pin_round_trips(spark, tmp_path):
    """Review pin (round 10): a datetime as_of pin must not crash save()
    — it degrades to its ISO string (the manifest JSON convention) and
    read()/version_at parse it back."""
    import datetime as dt
    import time

    st = _mk(spark, tmp_path / "t")
    time.sleep(0.05)
    cut = dt.datetime.now()
    st.append(spark.range(500, 510).selectExpr("id", "id AS x"))
    cat = LakeCatalog(spark)
    cat.register("snap", store=st, as_of=cut)
    reg = str(tmp_path / "registry.json")
    assert cat.save(reg) == 1
    cat2 = LakeCatalog.load(spark, reg)
    # The pin resolves to the pre-append snapshot, exactly as before.
    assert cat2.sql("SELECT count(*) AS n FROM snap").collect()[0].n == 150
    with pytest.raises(ValueError, match="pinned"):
        cat2.sql("DELETE FROM snap WHERE id = 1")


def test_writer_knobs_round_trip_and_shard_reuse(spark, tmp_path):
    """Round-11 ask #5: save/load carries checkpoint_shard_size (plus
    claim_wait/orphan_grace/max_partitions_per_commit), and a post-load
    writer's next checkpoint REUSES the saved table's shards instead of
    re-sharding the whole table at the default geometry."""
    import os

    from lakehouse_spark.catalog import LakeCatalog
    from lakehouse_spark.mutation.store import TableStore

    root = str(tmp_path / "t")
    st = TableStore(
        spark,
        root,
        key="id",
        stats_cols=("id",),
        checkpoint_interval=4,
        claim_wait_sec=1.5,
        orphan_grace_sec=77.0,
        max_partitions_per_commit=9,
    )
    st.checkpoint_sync = True
    st.checkpoint_shard_size = 3
    st.init(spark.range(0, 3).selectExpr("id", "id AS x"))
    for lo in range(3, 36, 3):
        st.append(spark.range(lo, lo + 3).selectExpr("id", "id AS x"))
    st.checkpoint_barrier()
    shards_before = sorted(
        f
        for f in os.listdir(root)
        if f.startswith("_checkpoint_") and "_shard_" in f
    )
    assert shards_before  # the sharded checkpoint exists

    cat = LakeCatalog(spark)
    cat.register("t", store=st)
    reg = str(tmp_path / "cat.json")
    cat.save(reg)

    cat2 = LakeCatalog.load(spark, reg)
    st2, _ = cat2._entries["t"]
    assert st2.checkpoint_shard_size == 3
    assert st2.claim_wait_sec == 1.5
    assert st2.orphan_grace_sec == 77.0
    assert st2.max_partitions_per_commit == 9
    # Drive the reloaded writer to its next checkpoint boundary: the new
    # checkpoint must carry most prior shards BY REFERENCE (same files on
    # disk still referenced), not rewrite every shard at a default
    # geometry.
    st2.checkpoint_sync = True
    v = st2.current_version()
    import json as _json

    from lakehouse_spark.mutation.manifest import checkpoint_path

    while st2.current_version() % st2.checkpoint_interval != 0 or (
        st2.current_version() == v
    ):
        st2.append(
            spark.range(100 + st2.current_version(), 101 + st2.current_version())
            .selectExpr("id", "id AS x")
        )
    with open(checkpoint_path(root, st2.current_version())) as f:
        doc = _json.load(f)
    new_shard_files = [sh["file"] for sh in doc["shards"]]
    reused = set(new_shard_files) & set(shards_before)
    assert reused, "post-load checkpoint rewrote every shard"
