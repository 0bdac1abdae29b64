"""Generated columns (Delta's GENERATED ALWAYS AS): declared per table in
the manifest, computed automatically when a write omits them, and
validated as implicit NULL-safe-equality constraints when a write (or a
merge update) provides a value — so stored data can never disagree with
the formula. Declaring the column in stats_cols makes derived-value
predicates prune segments, the generated-column partition-pruning story."""

from __future__ import annotations

import pytest

from lakehouse_spark.mutation.store import (
    ConstraintViolationError,
    TableStore,
)


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(
        spark, str(tmp_path / "t"), key="id", stats_cols=("day",)
    )
    s.init(
        spark.createDataFrame(
            [(1, "2024-03-01 10:00:00", "2024-03-01")],
            "id long, ts string, day string",
        )
    )
    s.set_generated("day", "substr(ts, 1, 10)")
    return s


def _rows(spark, *tuples, schema="id long, ts string"):
    return spark.createDataFrame(list(tuples), schema)


def test_declared_and_autofilled_on_append(spark, store):
    assert store.generated_columns() == {"day": "substr(ts, 1, 10)"}
    store.append(_rows(spark, (2, "2024-03-02 09:00:00")))
    got = {r.id: r.day for r in store.read().collect()}
    assert got == {1: "2024-03-01", 2: "2024-03-02"}


def test_provided_value_must_match_formula(spark, store):
    bad = spark.createDataFrame(
        [(3, "2024-03-03 08:00:00", "2024-99-99")],
        "id long, ts string, day string",
    )
    with pytest.raises(ConstraintViolationError, match="generated:day"):
        store.append(bad)
    assert store.read().count() == 1


def test_declaration_validates_existing_rows(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "bad"), key="id")
    s.init(
        spark.createDataFrame(
            [(1, "2024-03-01 10:00:00", "wrong")],
            "id long, ts string, day string",
        )
    )
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        s.set_generated("day", "substr(ts, 1, 10)")
    assert s.generated_columns() == {}


def test_merge_insert_computes_and_stale_update_rejected(spark, store):
    # INSERT branch: source omits the generated column → computed
    store.merge(_rows(spark, (5, "2024-03-05 01:00:00")))
    got = {r.id: r.day for r in store.read().collect()}
    assert got[5] == "2024-03-05"
    # UPDATE that changes ts but pins the OLD day value → formula disagrees
    stale = spark.createDataFrame(
        [(5, "2024-03-06 01:00:00", "2024-03-05")],
        "id long, ts string, day string",
    )
    with pytest.raises(ConstraintViolationError):
        store.merge(stale)


def test_stats_pruning_on_generated_column(spark, store):
    for d in ("2024-03-02", "2024-03-03"):
        store.append(_rows(spark, (int(d[-1]), f"{d} 12:00:00")))
    hit = store.read(predicate={"day": "2024-03-03"})
    assert [r.id for r in hit.collect()] == [3]


def test_drop_generated(spark, store):
    store.drop_generated("day")
    assert store.generated_columns() == {}
    # now a disagreeing value is the caller's business
    store.append(
        spark.createDataFrame(
            [(9, "2024-03-09 00:00:00", "whatever")],
            "id long, ts string, day string",
        )
    )
    assert store.read().count() == 2


def test_format_writer_requires_and_validates(spark, store):
    from lakehouse_spark.sources.table_source import LakehouseDataSource

    spark.dataSource.register(LakehouseDataSource)
    # omitted generated column → the commit runner cannot compute it
    with pytest.raises(Exception, match="generated column"):
        _rows(spark, (7, "2024-03-07 07:00:00")).write.format(
            "lakehouse"
        ).mode("append").save(store.root)
    # provided-but-wrong → constraint failure
    bad = spark.createDataFrame(
        [(7, "2024-03-07 07:00:00", "nope")],
        "id long, ts string, day string",
    )
    with pytest.raises(Exception, match="generated:day"):
        bad.write.format("lakehouse").mode("append").save(store.root)
    # provided-and-right commits
    ok = spark.createDataFrame(
        [(7, "2024-03-07 07:00:00", "2024-03-07")],
        "id long, ts string, day string",
    )
    ok.write.format("lakehouse").mode("append").save(store.root)
    assert store.read().count() == 2
