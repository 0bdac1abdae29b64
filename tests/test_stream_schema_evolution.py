"""Round-9 pin: a RUNNING lakehouse stream across schema evolution.

Decision (documented in ChangesStreamReader): a live stream serves its
REGISTRATION-TIME logical schema for its whole life — Spark fixes a
streaming query's schema at start, so this is the only non-silent option:

- additive evolution (append with a new column) mid-stream: rows keep
  flowing; the new column simply doesn't exist in the stream's output
  (a restart picks it up — schema is re-derived from the head);
- metadata-only RENAME mid-stream: rows keep flowing under the
  registration-time logical names — physical storage names are immutable,
  so the stream's pinned logical→physical map stays exact;
- DROP COLUMN mid-stream: segments written after the drop are physically
  purged, so the stream reads null for that column from then on (exactly
  the union-read semantics of the batch path);
- type changes can't reach a stream: every write path rejects them
  (SchemaMismatchError) before a manifest commits.

Never a silent misalignment: columns are conformed BY NAME per batch
(sources/table_source.py _read_files), not by position.
"""

from __future__ import annotations

import time

from lakehouse_spark.mutation.store import TableStore


def _start(spark, root, out, ckpt):
    return (
        spark.readStream.format("lakehouse")
        .option("maxVersionsPerBatch", "1")
        .load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )


def _wait_rows(spark, out, expected, deadline_sec=90):
    deadline = time.monotonic() + deadline_sec
    n = -1
    while n < expected and time.monotonic() < deadline:
        time.sleep(0.5)
        try:
            n = spark.read.parquet(out).count()
        except Exception:
            n = 0
    return n


def test_stream_serves_registration_schema_across_evolution(
    spark, tmp_path
):
    root = str(tmp_path / "ev")
    st = TableStore(spark, root, key="id", stats_cols=("id",))
    st.init(spark.createDataFrame([(1, "a")], "id long, v string"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = _start(spark, root, out, ckpt)
    try:
        assert _wait_rows(spark, out, 1) == 1

        # additive evolution mid-stream: new column flows as data rows,
        # the column itself is invisible to the pinned schema
        st.append(
            spark.createDataFrame(
                [(2, "b", "extra")], "id long, v string, w string"
            )
        )
        assert _wait_rows(spark, out, 2) == 2
        got = spark.read.parquet(out)
        assert sorted(got.columns) == ["id", "v"]
        assert {r.id for r in got.collect()} == {1, 2}

        # metadata-only rename mid-stream: physical names immutable, the
        # stream keeps serving the registration-time logical name
        st.rename_column("v", "value")
        st.append(
            spark.createDataFrame(
                [(3, "c")], "id long, value string"
            )
        )
        assert _wait_rows(spark, out, 3) == 3
        rows = {r.id: r.v for r in spark.read.parquet(out).collect()}
        assert rows[3] == "c"  # arrived under the old logical name
    finally:
        q.stop()
        q.awaitTermination(30)

    # restart re-derives the schema from the head: the renamed logical
    # name (and any added column) appears from here on
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    q2 = _start(spark, root, out2, ckpt2)
    try:
        assert _wait_rows(spark, out2, 3) == 3
        cols = set(spark.read.parquet(out2).columns)
        assert "value" in cols and "v" not in cols
    finally:
        q2.stop()
        q2.awaitTermination(30)


def test_stream_reads_null_for_column_dropped_midstream(spark, tmp_path):
    root = str(tmp_path / "dr")
    st = TableStore(spark, root, key="id")
    st.init(
        spark.createDataFrame([(1, "a", 10)], "id long, v string, x long")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = _start(spark, root, out, ckpt)
    try:
        assert _wait_rows(spark, out, 1) == 1
        st.drop_column("x")
        # post-drop writes physically purge x; the pinned stream schema
        # still carries it, so it reads null — never a misalignment
        st.append(spark.createDataFrame([(2, "b")], "id long, v string"))
        assert _wait_rows(spark, out, 2) == 2
        rows = {r.id: r.x for r in spark.read.parquet(out).collect()}
        assert rows[1] == 10 and rows[2] is None
    finally:
        q.stop()
        q.awaitTermination(30)
