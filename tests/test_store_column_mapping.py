"""Metadata-only RENAME/DROP COLUMN (Delta column mapping): no data file
is touched, the manifest records physical→logical, every public surface
(read, predicates, DML, CDF, clone, the format('lakehouse') reader) speaks
logical names, and files keep immutable physical names forever. At 100 TB
a rename that rewrote the table would be an outage; here it's one
metadata commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_spark.mutation.store import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(
        spark,
        str(tmp_path / "t"),
        key="id",
        stats_cols=("id", "qty"),
        bloom_cols=("id",),
    )
    s.init(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "id long, qty long, tag string"
        )
    )
    s.append(
        spark.createDataFrame(
            [(3, 30, "c"), (4, 40, "d")], "id long, qty long, tag string"
        )
    )
    return s


def seg_mtimes(root):
    out = {}
    for d in os.listdir(root):
        if d.startswith("_seg"):
            p = os.path.join(root, d)
            out[d] = tuple(
                sorted(os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p))
            )
    return out


def test_rename_is_metadata_only(spark, store):
    before = seg_mtimes(store.root)
    store.rename_column("qty", "quantity")
    assert seg_mtimes(store.root) == before  # zero data files touched
    df = store.read()
    assert sorted(df.columns) == ["id", "quantity", "tag"]
    assert {r.quantity for r in df.collect()} == {10, 20, 30, 40}
    # Old snapshots keep their own (pre-rename) names.
    assert sorted(store.read(version=1).columns) == ["id", "qty", "tag"]


def test_rename_chain_and_back(spark, store):
    store.rename_column("qty", "quantity")
    store.rename_column("quantity", "amount")
    assert store.renames() == {"qty": "amount"}  # chain collapses
    store.rename_column("amount", "qty")  # renaming back clears the map
    assert store.renames() == {}
    assert sorted(store.read().columns) == ["id", "qty", "tag"]


def test_rename_guards(spark, store):
    with pytest.raises(ValueError, match="key column"):
        store.rename_column("id", "ident")
    with pytest.raises(KeyError):
        store.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        store.rename_column("qty", "tag")
    store.rename_column("qty", "quantity")
    # 'qty' is now a reserved physical name: another column can't take it.
    with pytest.raises(ValueError, match="physical storage name"):
        store.rename_column("tag", "qty")
    store.add_constraint("pos", "quantity > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        store.rename_column("quantity", "n")


def test_predicate_pruning_uses_physical_stats(spark, store):
    store.compact(range_by="qty", n_segments=2)
    store.rename_column("qty", "quantity")
    # Logical-name predicate still prunes (stats are keyed physically).
    df = store.read(predicate={"quantity": (35, None)})
    assert {r.quantity for r in df.collect()} == {40}
    n_read = len(df.inputFiles())
    n_all = len(store.read().inputFiles())
    assert n_read < n_all  # at least one banded segment skipped
    # Equivalence contract holds through the mapping.
    assert df.count() == store.read().filter(F.col("quantity") > 34).count()


def test_writes_through_rename_store_physical(spark, store):
    store.rename_column("qty", "quantity")
    store.append(
        spark.createDataFrame([(5, 50, "e")], "id long, quantity long, tag string")
    )
    assert {r.quantity for r in store.read().collect()} == {10, 20, 30, 40, 50}
    # The new segment's parquet stores the PHYSICAL name.
    import pyarrow.parquet as pq

    seg = sorted(d for d in os.listdir(store.root) if d.startswith("_seg"))[-1]
    f = [
        os.path.join(store.root, seg, n)
        for n in os.listdir(os.path.join(store.root, seg))
        if n.endswith(".parquet")
    ][0]
    assert "qty" in pq.read_schema(f).names
    assert "quantity" not in pq.read_schema(f).names
    # Writing the physical name directly is rejected (it would bypass the
    # logical schema).
    with pytest.raises(Exception, match="physical storage name"):
        store.append(
            spark.createDataFrame([(6, 1, "f")], "id long, qty long, tag string")
        )


def test_dml_through_rename(spark, store):
    store.rename_column("qty", "quantity")
    store.upsert(
        spark.createDataFrame(
            [(2, 99, "B"), (9, 90, "i")], "id long, quantity long, tag string"
        )
    )
    rows = {r.id: r.quantity for r in store.read().collect()}
    assert rows == {1: 10, 2: 99, 3: 30, 4: 40, 9: 90}
    store.delete_keys(spark.createDataFrame([(1,)], "id long"))
    assert sorted(r.id for r in store.read().collect()) == [2, 3, 4, 9]
    store.merge(
        spark.createDataFrame([(2, 0, "z")], "id long, quantity long, tag string"),
        delete_cond="s.quantity = 0",
    )
    assert sorted(r.id for r in store.read().collect()) == [3, 4, 9]


def test_drop_column_hides_and_rewrite_purges(spark, store):
    store.drop_column("tag")
    df = store.read()
    assert sorted(df.columns) == ["id", "qty"]
    # The name is reserved while old bytes remain.
    with pytest.raises(ValueError, match="reserved"):
        store.append(spark.createDataFrame([(5, 1, "x")], "id long, qty long, tag string"))
    # A rewrite writes the logical schema — bytes physically purged.
    store.compact()
    import pyarrow.parquet as pq

    seg = [d for d in os.listdir(store.root) if d.startswith("_seg")]
    head_segs = set(seg) & set(
        store._snapshot(store.current_version())["segments"]
    )
    for s in head_segs:
        for n in os.listdir(os.path.join(store.root, s)):
            if n.endswith(".parquet"):
                assert "tag" not in pq.read_schema(
                    os.path.join(store.root, s, n)
                ).names


def test_changes_feed_speaks_logical(spark, store):
    store.rename_column("qty", "quantity")
    store.append(
        spark.createDataFrame([(7, 70, "g")], "id long, quantity long, tag string")
    )
    ch = store.changes(store.current_version())
    assert "quantity" in ch.columns and "qty" not in ch.columns
    assert [r.quantity for r in ch.collect()] == [70]
    # Rename commits themselves are noops in the feed (metadata, not data).
    v_rename = 2
    assert store.changes(v_rename, v_rename).count() == 0


def test_clone_carries_mapping_and_generated(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "g"), key="id")
    s.init(
        spark.createDataFrame(
            [(1, 10, 20), (2, 15, 30)], "id long, qty long, dq long"
        )
    )
    s.rename_column("qty", "quantity")
    s.set_generated("dq", "quantity * 2")
    s.append(
        spark.createDataFrame([(3, 40)], "id long, quantity long")
    )  # dq computed from the formula
    dst = s.clone(str(tmp_path / "c"))
    assert dst.renames() == {"qty": "quantity"}
    assert dst.generated_columns() == {"dq": "quantity * 2"}
    assert {r.id: r.dq for r in dst.read().collect()} == {1: 20, 2: 30, 3: 80}


def test_datasource_reads_logical_and_rejects_writes(spark, store):
    store.rename_column("qty", "quantity")
    df = spark.read.format("lakehouse").load(store.root)
    assert sorted(df.columns) == ["id", "quantity", "tag"]
    assert {r.quantity for r in df.collect()} == {10, 20, 30, 40}
    # Pushed filter on the logical name still returns exact results —
    # fresh load for the filtered scan (reusing the unfiltered relation
    # with a narrowing filter is the aliasing misuse the reader raises on
    # since round 12, test_datasource_push_aliasing_guard.py).
    df_f = spark.read.format("lakehouse").load(store.root)
    got = df_f.filter(F.col("quantity") > 25).select("id").collect()
    assert sorted(r.id for r in got) == [3, 4]
    with pytest.raises(Exception, match="cannot translate"):
        (
            spark.createDataFrame([(9, 90, "i")], "id long, quantity long, tag string")
            .write.format("lakehouse")
            .mode("append")
            .save(store.root)
        )


def test_datasource_drop_column(spark, store):
    store.drop_column("tag")
    df = spark.read.format("lakehouse").load(store.root)
    assert sorted(df.columns) == ["id", "qty"]
    assert df.count() == 4
