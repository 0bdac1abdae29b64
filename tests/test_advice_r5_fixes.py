"""Regression tests for the round-5 advisor findings:

1. TableStore._pending_stats must not survive an aborted transaction —
   stale min/max from a failed attempt, popped at a LATER commit after
   another writer legitimately rewrote the same segment dir, would make
   read(predicate=) silently skip segments that contain matching rows.
2. merge() must reject source columns absent from the target schema
   (Delta errors rather than silently discarding data) and must NOT
   reject duplicate NULL source keys (NULL never matches the equi-join,
   so no fan-out is possible).
3. stream_trace_turns state must be bounded by ACTIVE session
   cardinality: the per-session turn counter is evicted after the
   retention horizon, not kept forever.
4. aggregate_trace auto-split telemetry is per-thread (covered in
   test_trace_fold.py::test_auto_skew_split_engages_without_caller_flag).
"""

from __future__ import annotations

import pytest

from lakehouse_spark.mutation.store import TableStore


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_aborted_txn_discards_pending_stats(spark, tmp_path):
    """The advisor's exact scenario: writer A's transaction writes a
    segment (recording pending stats) then aborts; writer B claims the
    same version slot and rewrites the same _segNNNNNN dir with DIFFERENT
    data; writer A later commits. A's stale stats must not override B's —
    pruning must never change results."""
    root = str(tmp_path / "t")
    a = TableStore(spark, root, key="id", stats_cols=("x",))
    a.init(spark.createDataFrame([(1, 5), (2, 7)], "id long, x long"))

    # A's failed attempt: the segment lands on disk (x in 1000..2000),
    # stats go pending, then the commit dies before finalizing.
    high = spark.createDataFrame([(90, 1000), (91, 2000)], "id long, x long")

    def write_then_die(v):
        a._write_segment(high, v)
        raise RuntimeError("simulated mid-commit crash")

    with pytest.raises(RuntimeError, match="mid-commit crash"):
        a._transact(write_then_die)
    assert a._pending_stats == {}, "abort must clear this attempt's stats"

    # B claims the slot A released and writes LOW data into the very same
    # _seg000001 directory.
    b = TableStore(spark, root, key="id", stats_cols=("x",))
    b.append(spark.createDataFrame([(10, 20), (11, 30)], "id long, x long"))

    # A commits later; its manifest must carry B's stats for _seg000001
    # forward, not resurrect the stale 1000..2000 range.
    a.append(spark.createDataFrame([(50, 500)], "id long, x long"))

    pruned = a.read(predicate={"x": (20, 30)})
    assert _ids(pruned) == [10, 11], (
        "stats-pruned read lost rows — stale pending stats overrode the "
        "rewritten segment's real range"
    )
    # and the invariant read(predicate=p) == read().filter(p) holds
    full = a.read().filter("x >= 20 and x <= 30")
    assert _ids(pruned) == _ids(full)


def test_merge_rejects_unknown_source_columns(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "m"), key="id")
    s.init(spark.createDataFrame([(1, "a")], "id long, v string"))
    src = spark.createDataFrame(
        [(1, "A", "precious")], "id long, v string, extra string"
    )
    with pytest.raises(ValueError, match="absent from the target schema"):
        s.merge(src)
    # data unchanged by the rejected merge
    assert [(r.id, r.v) for r in s.read().collect()] == [(1, "a")]
    # explicit opt-in drops the column and applies the rest
    s.merge(src, extra_cols="ignore")
    assert [(r.id, r.v) for r in s.read().collect()] == [(1, "A")]
    with pytest.raises(ValueError, match="extra_cols"):
        s.merge(src, extra_cols="banana")


def test_merge_allows_duplicate_null_source_keys(spark, tmp_path):
    """Two null-key source rows can't fan any matched target row out (NULL
    never satisfies the equi-join) — they are legal, and with insert=True
    each inserts. A duplicate NON-null key still raises."""
    s = TableStore(spark, str(tmp_path / "n"), key="id")
    s.init(spark.createDataFrame([(1, "a")], "id long, v string"))
    src = spark.createDataFrame(
        [(None, "n1"), (None, "n2"), (2, "b")], "id long, v string"
    )
    s.merge(src)  # must not raise
    got = sorted(((r.id, r.v) for r in s.read().collect()), key=str)
    assert (1, "a") in got and (2, "b") in got
    assert sorted(v for i, v in got if i is None) == ["n1", "n2"]

    dup = spark.createDataFrame([(3, "x"), (3, "y")], "id long, v string")
    with pytest.raises(ValueError, match="multiple rows"):
        s.merge(dup)


def test_stream_state_retention_evicts_idle_counter(spark, tmp_path):
    """After retention_ms of full idleness the per-session counter row is
    removed: stateOperators.numRowsTotal returns to 0, so long-running
    streams hold state proportional to ACTIVE sessions, not to every
    session ever seen."""
    import json
    import time

    from lakehouse_spark.schemas import TRACE_EVENT
    from lakehouse_spark.sources import jsonl as jl
    from lakehouse_spark.streaming import live

    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    (events_dir / "a.jsonl").write_text(
        json.dumps(
            {
                "session_id": "s1",
                "ts": "2026-01-01T00:00:00+00:00",
                "lvl": "INFO",
                "event": "prompt:submit",
                "data": {"prompt": "hello"},
                "encounter_seq": 1,
            }
        )
        + "\n"
    )

    stream = jl.read_jsonl_stream(spark, str(events_dir), TRACE_EVENT)
    q = (
        live.stream_trace_turns(stream, timeout_ms=100, retention_ms=1500)
        .writeStream.format("memory")
        .queryName("retention_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        # 1) the open turn flushes via the processing-time timeout
        rows = []
        while not rows and time.monotonic() < deadline:
            time.sleep(0.3)
            rows = spark.sql("SELECT * FROM retention_evict").collect()
        assert [r.turn_id for r in rows] == [1]

        # 2) the counter row survives the flush but is evicted once the
        # retention horizon passes — observable in the progress metrics
        def state_rows():
            p = q.lastProgress
            ops = (p or {}).get("stateOperators") or []
            return ops[0]["numRowsTotal"] if ops else None

        seen_one = False
        evicted = False
        while time.monotonic() < deadline:
            n = state_rows()
            if n == 1:
                seen_one = True
            if seen_one and n == 0:
                evicted = True
                break
            time.sleep(0.3)
        assert seen_one, "counter row never observed in state"
        assert evicted, "idle counter row was never evicted"
    finally:
        q.stop()
