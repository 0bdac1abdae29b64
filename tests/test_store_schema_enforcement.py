"""Write-time schema enforcement (Delta's contract): a type-conflicting
append is rejected at the write — committing it would brick EVERY later
read of the whole table at parquet schema-merge time, far from the write
that caused it. Additive new columns and missing columns stay allowed
(mergeSchema reads fill nulls); overwrite may redefine the schema."""

from __future__ import annotations

import pytest

from lakehouse_spark.mutation.store import SchemaMismatchError, TableStore


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "t"), key="id")
    s.init(spark.createDataFrame([(1, 10)], "id long, x long"))
    return s


def test_type_conflict_rejected_table_stays_readable(spark, store):
    with pytest.raises(SchemaMismatchError, match="x: table=bigint"):
        store.append(
            spark.createDataFrame([(2, "oops")], "id long, x string")
        )
    assert store.current_version() == 0
    assert store.read().count() == 1  # the poison write never landed


def test_additive_and_missing_columns_still_pass(spark, store):
    store.append(
        spark.createDataFrame([(2, 20, "n")], "id long, x long, note string")
    )
    store.append(spark.createDataFrame([(3,)], "id long"))
    rows = {r.id: (r.x, r.note) for r in store.read().collect()}
    assert rows == {1: (10, None), 2: (20, "n"), 3: (None, None)}


def test_overwrite_may_redefine_schema(spark, store):
    store.overwrite(spark.createDataFrame([(9, "s")], "id long, x string"))
    assert [r.x for r in store.read().collect()] == ["s"]


def test_format_writer_append_rejects_conflict(spark, store):
    from lakehouse_spark.sources.table_source import LakehouseDataSource

    spark.dataSource.register(LakehouseDataSource)
    bad = spark.createDataFrame([(5, "oops")], "id long, x string")
    with pytest.raises(Exception, match="changes column type"):
        bad.write.format("lakehouse").mode("append").save(store.root)
    assert store.read().count() == 1
    # additive column via the format writer still works
    ok = spark.createDataFrame(
        [(6, 60, True)], "id long, x long, flag boolean"
    )
    ok.write.format("lakehouse").mode("append").save(store.root)
    assert store.read().count() == 2


def test_upsert_rejects_type_conflict_both_modes(spark, store):
    # int source into a long table: mergeSchema can't reconcile INT32 vs
    # INT64 footers, so letting this land would brick every later read.
    bad = spark.createDataFrame([(1, 99)], "id long, x int")
    for mode in ("rewrite", "dv"):
        with pytest.raises(SchemaMismatchError, match="upsert"):
            store.upsert(bad, mode=mode)
    assert store.current_version() == 0
    assert store.read().count() == 1


def test_merge_rejects_type_conflict(spark, store):
    bad = spark.createDataFrame([(1, "s")], "id long, x string")
    with pytest.raises(SchemaMismatchError, match="merge"):
        store.merge(bad)
    assert store.current_version() == 0


def test_merge_evolve_still_adds_new_columns(spark, store):
    src = spark.createDataFrame([(1, 11, "n")], "id long, x long, note string")
    store.merge(src, extra_cols="evolve")
    row = store.read().collect()[0]
    assert (row.x, row.note) == (11, "n")


def test_overwrite_where_rejects_type_conflict(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "ow"), key="id", stats_cols=("id",))
    s.init(spark.createDataFrame([(1, 10), (5, 50)], "id long, x long"))
    bad = spark.createDataFrame([(1, 99)], "id long, x int")
    with pytest.raises(SchemaMismatchError, match="overwrite_where"):
        s.overwrite_where(bad, {"id": (None, 3)})
    assert s.current_version() == 0
    assert {r.x for r in s.read().collect()} == {10, 50}
