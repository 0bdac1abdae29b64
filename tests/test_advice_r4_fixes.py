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
