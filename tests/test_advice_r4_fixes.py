"""Regression tests for the round-4 advisor findings: null-ambiguous group
keys (mview / scd2), curation's id_col plumbing, schema-evolved CDF fast
path, dirty range-join windows, and empty-token postings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_spark.mutation.mview import MaterializedAgg
from lakehouse_spark.mutation.scd import scd2_history
from lakehouse_spark.mutation.store import TableStore
from lakehouse_spark.operators.curation_job import run_curation
from lakehouse_spark.operators.joins import range_bucket_join
from lakehouse_spark.operators.search import postings


def test_mview_null_groups_do_not_collide(spark, tmp_path):
    """(NULL,'x') vs ('x',NULL) vs ('x','') vs (NULL,NULL) are four distinct
    groups; concat_ws keying collapsed them. The view must match a
    from-scratch recompute group-for-group."""
    base = TableStore(spark, str(tmp_path / "base"), key="id")
    rows = [
        (1, None, "x", 1.0),
        (2, "x", None, 2.0),
        (3, "x", "", 4.0),
        (4, None, None, 8.0),
        (5, "", "x", 16.0),
        (6, None, "x", 32.0),  # second member of group (NULL,'x')
    ]
    base.init(
        spark.createDataFrame(rows, "id long, g1 string, g2 string, amount double")
    )
    mv = MaterializedAgg(
        spark, str(tmp_path / "view"), base, ["g1", "g2"], sum_cols=("amount",)
    )
    mv.refresh()
    got = {
        (r.g1, r.g2): (r.n, float(r.sum_amount)) for r in mv.read().collect()
    }
    assert got == {
        (None, "x"): (2, 33.0),
        ("x", None): (1, 2.0),
        ("x", ""): (1, 4.0),
        (None, None): (1, 8.0),
        ("", "x"): (1, 16.0),
    }
    # incremental path must land deltas on the right null-bearing group
    base.append(
        spark.createDataFrame([(7, "x", None, 100.0)], base.read().schema)
    )
    mv.refresh()
    got2 = {
        (r.g1, r.g2): (r.n, float(r.sum_amount)) for r in mv.read().collect()
    }
    assert got2[("x", None)] == (2, 102.0)
    assert got2[(None, "x")] == (2, 33.0)


def test_scd2_null_rows_pair_independently(spark, tmp_path):
    """Two rows differing only in which column is NULL must carry separate
    open/close intervals — the concat_ws identity fused them."""
    store = TableStore(spark, str(tmp_path / "t"), key="id")
    store.init(
        spark.createDataFrame(
            [(1, None, "x"), (1, "x", None)], "id long, a string, b string"
        )
    )
    # drop only the (1, NULL, 'x') variant
    store.overwrite(
        store.read().filter(~(F.col("a").isNull() & (F.col("b") == "x")))
    )
    hist = scd2_history(store).collect()
    by_row = {(r.a, r.b): r for r in hist}
    assert len(hist) == 2
    assert by_row[(None, "x")].is_current is False
    assert by_row[(None, "x")].valid_to is not None
    assert by_row[("x", None)].is_current is True
    assert by_row[("x", None)].valid_to is None


def test_run_curation_respects_custom_id_col(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps over a lazy dog in the field " * 6)
            for i in range(6)
        ]
        + [(10, "an entirely different document about spark shuffles and "
               "partitions with plenty of ordinary connective words to pass "
               "the quality gate and survive into the export stage today " * 5)],
        "my_id long, text string",
    )
    bench = spark.createDataFrame([("never matches anything",)], "text string")
    stats = run_curation(
        spark, docs, bench, str(tmp_path / "out"), id_col="my_id"
    )
    assert stats["n_input"] == 7
    assert stats["n_after_exact"] == 2  # 6 exact copies collapse to 1
    assert stats["n_after_decontam"] >= 1


def test_diff_fast_path_keeps_evolved_columns(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "t"), key="id")
    store.init(spark.createDataFrame([(1, "a")], "id long, v string"))
    store.append(
        spark.createDataFrame([(2, "b", 7.5)], "id long, v string, extra double")
    )
    d = store.diff(0)
    assert "extra" in d.columns
    row = d.filter(F.col("id") == 2).collect()[0]
    assert row.extra == 7.5 and row._change == "insert"


def test_range_bucket_join_ignores_inverted_windows(spark):
    events = spark.createDataFrame(
        [(1, "2024-03-02 12:00:00")], "eid long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    windows = spark.createDataFrame(
        [
            ("good", "2024-03-02 00:00:00", "2024-03-03 00:00:00"),
            ("bad", "2024-03-05 00:00:00", "2024-03-01 00:00:00"),  # inverted
        ],
        "wid string, start string, end string",
    ).withColumn("start", F.to_timestamp("start")).withColumn(
        "end", F.to_timestamp("end")
    )
    out = range_bucket_join(events, windows, "ts", "start", "end")
    assert [r.wid for r in out.select("wid").collect()] == ["good"]


def test_postings_skip_empty_documents(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    p = postings(docs, "doc_id", "text").collect()
    assert {(r.doc_id, r.token) for r in p} == {(1, "hello"), (1, "world")}


# --- round-5 self-review regressions ----------------------------------------


def test_adaptive_skew_join_survives_hot_null_group(spark):
    """A NULL-key group heavy enough to qualify as hot must not poison the
    cold branch's isin() filter (NOT IN (NULL, ...) is NULL, not TRUE)."""
    from lakehouse_spark.operators.skew import adaptive_skew_join

    rows = [(i, None, 1.0) for i in range(400)]            # hot NULL group
    rows += [(400 + i, f"k{i % 10}", 2.0) for i in range(100)]  # cold keys
    fact = spark.createDataFrame(rows, "id long, k string, x double")
    dim = spark.createDataFrame(
        [(f"k{j}", f"D{j}") for j in range(10)], "k string, label string"
    )
    for how in ("inner", "left"):
        got = adaptive_skew_join(
            fact, dim, "k", hot_multiplier=2.0, min_hot_rows=50, how=how
        )
        want = fact.join(dim, "k", how)
        assert sorted((r.id, r.label) for r in got.collect()) == sorted(
            (r.id, r.label) for r in want.collect()
        ), how


def test_zorder_compact_keeps_null_key_rows(spark, tmp_path):
    from lakehouse_spark.mutation.store import TableStore

    store = TableStore(spark, str(tmp_path / "z"), key="id", stats_cols=("xa",))
    rows = [(i, i % 20, i % 7) for i in range(200)]
    rows += [(1000, None, 3), (1001, 5, None), (1002, None, None)]
    store.init(spark.createDataFrame(rows, "id long, xa long, xb long"))
    store.compact(zorder_by=("xa", "xb"), bits=4, n_segments=4)
    got = sorted(r.id for r in store.read().collect())
    assert got == sorted([r[0] for r in rows])  # nothing lost
    assert store.n_segments() == 4


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    import pytest

    from lakehouse_spark.mutation.store import TableStore

    s = TableStore(spark, str(tmp_path / "m"), key="id")
    s.init(spark.createDataFrame([(1, "a")], "id long, v string"))
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "id long, v string")
    with pytest.raises(ValueError, match="multiple rows for key"):
        s.merge(dup)
    assert s.read().count() == 1  # store untouched


def test_predicate_read_evolved_column_fully_pruned(spark, tmp_path):
    """When pruning removes every segment carrying an evolved column, the
    read must fall back (not throw) and still equal read().filter(...)."""
    from pyspark.sql import functions as F

    from lakehouse_spark.mutation.store import TableStore

    store = TableStore(spark, str(tmp_path / "ev"), key="id", stats_cols=("extra",))
    store.init(spark.createDataFrame([(1,)], "id long"))
    store.append(spark.createDataFrame([(2, 7)], "id long, extra long"))
    out = store.read(predicate={"extra": (200, 300)})  # prunes the only extra-bearing seg
    assert out.count() == 0
    assert sorted(out.columns) == ["extra", "id"]


def test_mview_old_key_format_triggers_full_rebuild(spark, tmp_path):
    """A view persisted without the current key-format marker must be fully
    rebuilt on refresh, not incrementally merged (old and new keys would
    never match and every group would double)."""
    from pyspark.sql import functions as F

    from lakehouse_spark.mutation.mview import MaterializedAgg
    from lakehouse_spark.mutation.store import TableStore

    base = TableStore(spark, str(tmp_path / "b"), key="id")
    base.init(spark.createDataFrame(
        [(1, "g1", 1.0), (2, "g2", 2.0)], "id long, grp string, amount double"))
    mv = MaterializedAgg(spark, str(tmp_path / "v"), base, ["grp"], ("amount",))
    mv.refresh()
    # simulate a pre-round-5 view: rewrite the view with legacy-format keys
    # and WITHOUT the format marker
    legacy = mv.view.read().withColumn(
        "_group_key", F.concat_ws("\x1f", "grp")
    )
    mv.view.overwrite(legacy, meta={MaterializedAgg.META_KEY: base.current_version()})
    base.append(spark.createDataFrame([(3, "g1", 10.0)], base.read().schema))
    mv.refresh()
    got = {r.grp: (r.n, float(r.sum_amount)) for r in mv.read().collect()}
    assert got == {"g1": (2, 11.0), "g2": (1, 2.0)}  # no doubled groups
    assert mv.view.version_meta()[MaterializedAgg.FORMAT_KEY] == MaterializedAgg.FORMAT
