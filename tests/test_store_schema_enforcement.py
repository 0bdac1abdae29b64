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
    with pytest.raises(SchemaMismatchError, match="x: table=LongType"):
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
