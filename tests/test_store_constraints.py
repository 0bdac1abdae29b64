"""CHECK constraints on TableStore (Delta's ALTER TABLE ADD CONSTRAINT /
InvariantViolationException contract): constraints live in the manifest
(carried forward like txn watermarks), ADD validates existing live data,
every write path — append, upsert, merge post-images, overwrite,
compaction rewrites, and the format("lakehouse") writers — enforces them
BEFORE the pointer moves, and a violating commit leaves the table intact
at its prior version."""

from __future__ import annotations

import pytest

from lakehouse_spark.mutation.store import (
    ConstraintViolationError,
    TableStore,
)


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "t"), key="id")
    s.init(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, v string, x long",
        )
    )
    return s


def _rows(spark, *tuples):
    return spark.createDataFrame(list(tuples), "id long, v string, x long")


def test_add_list_drop(spark, store):
    v = store.add_constraint("x_pos", "x > 0")
    assert v == 1
    assert store.constraints() == {"x_pos": "x > 0"}
    # carried forward through an unrelated commit
    store.append(_rows(spark, (4, "d", 40)))
    assert store.constraints() == {"x_pos": "x > 0"}
    store.drop_constraint("x_pos")
    assert store.constraints() == {}
    with pytest.raises(KeyError):
        store.drop_constraint("x_pos")
    store.add_constraint("dup", "x > 0")
    with pytest.raises(ValueError, match="already exists"):
        store.add_constraint("dup", "x > 1")


def test_add_rejects_existing_violations(spark, store):
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        store.add_constraint("x_big", "x >= 20")
    # nothing committed
    assert store.current_version() == 0
    assert store.constraints() == {}


def test_add_validates_live_rows_not_deleted_ones(spark, store):
    # id=1 (x=10) violates x >= 20; dv-delete it, then the constraint fits
    store.delete_keys(
        spark.createDataFrame([(1,)], "id long"), mode="dv"
    )
    store.add_constraint("x_big", "x >= 20")
    assert store.constraints() == {"x_big": "x >= 20"}


def test_append_violation_aborts_commit(spark, store):
    store.add_constraint("x_pos", "x > 0")
    v_before = store.current_version()
    with pytest.raises(ConstraintViolationError, match="x_pos"):
        store.append(_rows(spark, (9, "z", -5)))
    assert store.current_version() == v_before
    assert store.read().count() == 3
    # valid rows still append fine afterwards
    store.append(_rows(spark, (4, "d", 40)))
    assert store.read().count() == 4


def test_merge_update_into_violation_aborts(spark, store):
    store.add_constraint("x_pos", "x > 0")
    v_before = store.current_version()
    src = _rows(spark, (2, "b2", -1))
    with pytest.raises(ConstraintViolationError):
        store.upsert(src)
    assert store.current_version() == v_before
    assert sorted(r.x for r in store.read().collect()) == [10, 20, 30]


def test_null_check_passes_sql_semantics(spark, store):
    store.add_constraint("x_pos", "x > 0")
    rows = spark.createDataFrame(
        [(5, "e", None)], "id long, v string, x long"
    )
    store.append(rows)  # NULL CHECK result is not a violation
    assert store.read().count() == 4


def test_restore_and_compact_keep_constraints(spark, store):
    store.add_constraint("x_pos", "x > 0")
    store.append(_rows(spark, (4, "d", 40)))
    store.compact()
    assert store.constraints() == {"x_pos": "x > 0"}
    store.restore(store.current_version() - 1)
    assert store.constraints() == {"x_pos": "x > 0"}


def test_format_writer_enforces(spark, store):
    from lakehouse_spark.sources.table_source import LakehouseDataSource

    spark.dataSource.register(LakehouseDataSource)
    store.add_constraint("x_pos", "x > 0")
    bad = _rows(spark, (7, "g", -3))
    with pytest.raises(Exception, match="x_pos"):
        bad.write.format("lakehouse").mode("append").save(store.root)
    assert store.read().count() == 3
    good = _rows(spark, (7, "g", 7))
    good.write.format("lakehouse").mode("append").save(store.root)
    assert store.read().count() == 4
