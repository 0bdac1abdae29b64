"""delete_where — Delta's DELETE FROM t WHERE ...: exact-row rewrite
deletes with predicate file skipping, merge-on-read dv deletes with the
key-granularity guard, CDF pre-images, and no-op hygiene."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from lakehouse_spark.mutation.store import TableStore


def _manifest(store):
    # Round 9: manifests are per-commit deltas; assertions run against the
    # MATERIALIZED snapshot (segments/stats/dv/partitions as readers see them).
    return store._snapshot(store.current_version())


def _mk(spark, tmp_path, **kw):
    s = TableStore(spark, str(tmp_path / "t"), key="id", **kw)
    s.init(
        spark.createDataFrame(
            [(i, f"d{i % 3}", i * 10) for i in range(30)],
            "id long, day string, x long",
        )
    )
    return s


def test_rewrite_deletes_exact_rows(spark, tmp_path):
    s = _mk(spark, tmp_path)
    removed = s.delete_where(where="x >= 250")
    assert removed == 5
    assert sorted(r.id for r in s.read().collect()) == list(range(25))
    # WHERE evaluating NULL spares the row (SQL DELETE semantics)
    s.append(
        spark.createDataFrame(
            [(100, None, None)], "id long, day string, x long"
        )
    )
    assert s.delete_where(where="x > 0 AND day = 'd9'") == 0
    assert s.read().filter("id = 100").count() == 1


def test_rewrite_deletes_rows_not_keys(spark, tmp_path):
    """DELETE WHERE must be row-exact even when keys repeat — the trap a
    delete-by-matched-keys implementation falls into."""
    s = TableStore(spark, str(tmp_path / "dups"), key="id")
    s.init(
        spark.createDataFrame(
            [(1, "keep"), (1, "drop"), (2, "keep")], "id long, v string"
        )
    )
    assert s.delete_where(where="v = 'drop'") == 1
    got = sorted((r.id, r.v) for r in s.read().collect())
    assert got == [(1, "keep"), (2, "keep")]


def test_predicate_skips_untouched_partitions(spark, tmp_path):
    s = TableStore(
        spark, str(tmp_path / "p"), key="id", partition_by=("day",)
    )
    s.init(
        spark.createDataFrame(
            [(i, f"d{i % 3}", i) for i in range(30)],
            "id long, day string, x long",
        )
    )
    before = _manifest(s)["segments"]
    removed = s.delete_where(where="x < 10", predicate={"day": "d1"})
    assert removed == sum(1 for i in range(30) if i % 3 == 1 and i < 10)
    after = _manifest(s)["segments"]
    # d0/d2 segments reused by reference
    assert len([x for x in after if x in before]) == 2
    assert s.read().count() == 30 - removed


def test_predicate_only_no_match_no_commit(spark, tmp_path):
    s = _mk(spark, tmp_path, stats_cols=("x",))
    v = s.current_version()
    assert s.delete_where(predicate={"x": (5000, None)}) == 0
    assert s.current_version() == v  # stats proved it; no commit at all
    with pytest.raises(ValueError, match="no condition"):
        s.delete_where()


def test_dv_mode_masks_and_feeds_cdf(spark, tmp_path):
    s = _mk(spark, tmp_path, write_cdf=True)
    segs_before = _manifest(s)["segments"]
    removed = s.delete_where(where="x BETWEEN 100 AND 120", mode="dv")
    assert removed == 3
    m = _manifest(s)
    assert m["segments"] == segs_before  # nothing rewritten
    assert len(m["dv"]) == 1
    assert s.read().count() == 27
    # the dv pre-images ARE the change feed rows
    ch = s.changes(s.current_version(), s.current_version())
    got = sorted(
        (r["_change_type"], r.id) for r in ch.collect()
    )
    assert got == [("delete", 10), ("delete", 11), ("delete", 12)]


def test_dv_scoped_to_touched_segments(spark, tmp_path):
    """Round-8 advisor fix (dml.py:803): a dv from a predicate-scoped
    delete must apply ONLY to the predicate-touched segments. With the dv
    registered against ALL segments, a matched key's sibling rows in
    predicate-PRUNED partitions were silently masked (and the CDF
    under-reported the extra delete)."""
    s = TableStore(
        spark,
        str(tmp_path / "sib"),
        key="id",
        partition_by=("day",),
        write_cdf=True,
    )
    s.init(
        spark.createDataFrame(
            [(1, "d0", 10), (1, "d1", 11), (2, "d0", 20)],
            "id long, day string, x long",
        )
    )
    removed = s.delete_where(predicate={"day": "d1"}, mode="dv")
    assert removed == 1
    # key 1's d0 sibling row SURVIVES: the dv is scoped to the d1 segment
    got = sorted((r.id, r.day) for r in s.read().collect())
    assert got == [(1, "d0"), (2, "d0")]
    m = _manifest(s)
    (applies_to,) = m["dv"].values()
    assert set(applies_to) < set(m["segments"])  # strict subset
    parts = m["partitions"]
    assert all(parts[seg].get("day") == "d1" for seg in applies_to)
    # CDF reports exactly the one deleted row
    ch = s.changes(s.current_version(), s.current_version())
    assert [(r["_change_type"], r.id, r.day) for r in ch.collect()] == [
        ("delete", 1, "d1")
    ]
    # and the guard is now sound per-scope: within the touched partition a
    # partial-key match still raises
    s2 = TableStore(
        spark, str(tmp_path / "sib2"), key="id", partition_by=("day",)
    )
    s2.init(
        spark.createDataFrame(
            [(1, "d0", 1), (1, "d0", 2)], "id long, day string, x long"
        )
    )
    with pytest.raises(ValueError, match="masks by key"):
        s2.delete_where(where="x = 1", predicate={"day": "d0"}, mode="dv")


def test_dv_mode_key_granularity_guard(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "g"), key="id")
    s.init(
        spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "id long, v string"
        )
    )
    with pytest.raises(ValueError, match="masks by key"):
        s.delete_where(where="v = 'a'", mode="dv")
    # full-key matches are fine
    assert s.delete_where(where="id = 1", mode="dv") == 2
    assert sorted(r.v for r in s.read().collect()) == ["c"]
