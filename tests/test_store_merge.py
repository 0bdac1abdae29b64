"""Conditional MERGE: the Delta clause semantics on TableStore — DELETE
before UPDATE, condition-gated updates, partial column updates, insert
toggling, schema-superset targets, and txn idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark.mutation.store import TableStore


def _store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "t"), key="id")
    s.init(
        spark.createDataFrame(
            [(1, "a", 10.0, "keep"), (2, "b", 20.0, "keep"), (3, "c", 30.0, "keep")],
            "id long, v string, amt double, note string",
        )
    )
    return s


def _rows(s):
    return {r.id: (r.v, r.amt, r.note) for r in s.read().collect()}


def test_merge_upsert_shape(spark, tmp_path):
    s = _store(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "B2", 22.0, "upd"), (4, "d", 40.0, "new")],
        "id long, v string, amt double, note string",
    )
    s.merge(src)
    assert _rows(s) == {
        1: ("a", 10.0, "keep"),
        2: ("B2", 22.0, "upd"),
        3: ("c", 30.0, "keep"),
        4: ("d", 40.0, "new"),
    }


def test_merge_conditional_update_and_delete(spark, tmp_path):
    s = _store(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "A", 4.0, "x"), (2, "B", 99.0, "x"), (3, "C", 25.0, "x")],
        "id long, v string, amt double, note string",
    )
    # DELETE first (incoming collapsed below half the current value),
    # then UPDATE only when the incoming amt is higher
    s.merge(
        src,
        update_cond="s.amt > t.amt",
        delete_cond="s.amt < t.amt / 2",
        insert=False,
    )
    got = _rows(s)
    assert 1 not in got                   # 4.0 < 10.0/2 → deleted
    assert got[2] == ("B", 99.0, "x")     # 99 > 20 → updated
    assert got[3] == ("c", 30.0, "keep")  # 25 ≥ 15 (no delete), 25 < 30 (no update)


def test_merge_partial_column_update(spark, tmp_path):
    s = _store(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "ZZZ", 77.0, "ignored")], "id long, v string, amt double, note string"
    )
    s.merge(src, update_cols=["amt"])
    assert _rows(s)[1] == ("a", 77.0, "keep")  # only amt rewritten


def test_merge_insert_missing_columns_null(spark, tmp_path):
    s = _store(spark, tmp_path)
    src = spark.createDataFrame([(9, "z")], "id long, v string")
    s.merge(src)
    got = {r.id: (r.v, r.amt, r.note) for r in s.read().collect()}
    assert got[9] == ("z", None, None)  # absent source cols insert as null
    assert got[1] == ("a", 10.0, "keep")  # matched row updated only on shared cols? no cond → v updated
    # matched rows update only columns the source HAS (v), not amt/note


def test_merge_no_insert_leaves_unmatched_source_out(spark, tmp_path):
    s = _store(spark, tmp_path)
    src = spark.createDataFrame(
        [(8, "x", 1.0, "n")], "id long, v string, amt double, note string"
    )
    s.merge(src, insert=False)
    assert 8 not in _rows(s)


def test_merge_on_empty_store_inits(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "e"), key="id")
    s.merge(spark.createDataFrame([(1, "a")], "id long, v string"))
    assert {r.id for r in s.read().collect()} == {1}


def test_merge_txn_idempotence(spark, tmp_path):
    s = _store(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "A", 11.0, "t1")], "id long, v string, amt double, note string"
    )
    s.merge(src, txn=("app", 7))
    assert s.last_txn_version("app") == 7
    # replay guard is the caller's protocol: check before re-applying
    if s.last_txn_version("app") >= 7:
        pass  # skip duplicate batch
    assert _rows(s)[1] == ("A", 11.0, "t1")


def test_merge_schema_evolution(spark, tmp_path):
    """extra_cols='evolve' widens the target: existing rows read null for
    the new column, the matched update and the insert both carry it, and
    subsequent merges see the evolved schema as ordinary columns."""
    s = _store(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "A1", 11.0, "u", "tag1"), (9, "z", 90.0, "new", "tag9")],
        "id long, v string, amt double, note string, label string",
    )
    s.merge(src, extra_cols="evolve")
    got = {r.id: (r.v, r.amt, r.note, r.label) for r in s.read().collect()}
    assert got[1] == ("A1", 11.0, "u", "tag1")   # update carries new col
    assert got[9] == ("z", 90.0, "new", "tag9")  # insert carries new col
    assert got[2] == ("b", 20.0, "keep", None)   # untouched row: null
    # evolved column is now a first-class target column
    s.merge(
        spark.createDataFrame(
            [(2, "tag2")], "id long, label string"
        ),
        update_cols=["label"],
    )
    assert {r.id: r.label for r in s.read().collect()}[2] == "tag2"


def test_merge_property_vs_reference_model(spark, tmp_path):
    """Randomized MERGE against a python reference model: for random
    base/source key-value sets and every condition combination, the store
    result must equal clause-by-clause simulation (DELETE before UPDATE,
    unmatched target kept, unmatched source inserted)."""
    import itertools
    import random

    rng = random.Random(20260814)
    for trial in range(6):
        base_rows = [(i, rng.randint(0, 50)) for i in rng.sample(range(12), 7)]
        src_rows = [(i, rng.randint(0, 50)) for i in rng.sample(range(12), 7)]
        for update_cond, delete_cond, insert in itertools.product(
            [None, "s.x > t.x"], [None, "s.x < 10"], [True, False]
        ):
            s = TableStore(
                spark, str(tmp_path / f"m{trial}_{update_cond}_{delete_cond}_{insert}"),
                key="id",
            )
            s.init(spark.createDataFrame(base_rows, "id long, x long"))
            s.merge(
                spark.createDataFrame(src_rows, "id long, x long"),
                update_cond=update_cond,
                delete_cond=delete_cond,
                insert=insert,
            )
            got = {r.id: r.x for r in s.read().collect()}

            src = dict(src_rows)
            want = {}
            for i, x in base_rows:
                if i in src:
                    sx = src[i]
                    if delete_cond is not None and sx < 10:
                        continue
                    if update_cond is None or sx > x:
                        want[i] = sx
                    else:
                        want[i] = x
                else:
                    want[i] = x
            if insert:
                for i, sx in src.items():
                    if i not in dict(base_rows):
                        want[i] = sx
            assert got == want, (
                trial, update_cond, delete_cond, insert, got, want
            )
