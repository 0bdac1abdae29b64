"""Golden-fixture tests for the S1 marker-based trace fold
(operators/sessionize.aggregate_trace) — edge cases implied by the
reference's code paths (SURVEY.md §5): malformed timestamps, unclosed
turns, unmatched tool:post, back-to-back prompts, error results,
payload truncation, sub-agent child-session extraction.
"""

from __future__ import annotations

from lakehouse_spark.operators.sessionize import aggregate_trace
from lakehouse_spark.schemas import TRACE_EVENT


def _ev(seq, event, ts="2026-01-01T00:00:00+00:00", session="s1", **data):
    base = {
        "prompt": None,
        "tool_name": None,
        "tool_input": None,
        "parallel_group_id": None,
        "delta": None,
        "result": None,
    }
    base.update(data)
    return (session, ts, "INFO", event, base, seq)


def _turns(spark, rows):
    df = spark.createDataFrame(rows, TRACE_EVENT)
    return {
        (t["session_id"], t["turn_id"]): t
        for t in (r.asDict(recursive=True) for r in aggregate_trace(df).collect())
    }


def test_basic_turn_with_tool(spark):
    rows = [
        _ev(1, "prompt:submit", "2026-01-01T00:00:00+00:00", prompt="hi"),
        _ev(2, "tool:pre", "2026-01-01T00:00:01+00:00", tool_name="Bash"),
        _ev(
            3,
            "tool:post",
            "2026-01-01T00:00:03.500000+00:00",
            tool_name="Bash",
            result={"success": True, "output": "ok", "error": None},
        ),
        _ev(4, "thinking:delta", delta="hmm"),
        _ev(5, "session:end", "2026-01-01T00:00:05+00:00"),
    ]
    t = _turns(spark, rows)[("s1", 1)]
    assert t["status"] == "completed"
    assert t["user_message"] == "hi"
    assert t["end_time"] == 1767225605000
    (tool,) = t["tools"]
    assert tool["status"] == "completed"
    assert tool["result"] == "ok"
    assert tool["duration"] == 2500
    assert len(t["thinking"]) == 1


def test_back_to_back_prompts_implicit_close(spark):
    rows = [
        _ev(1, "prompt:submit", prompt="one"),
        _ev(2, "prompt:submit", prompt="two"),
    ]
    t = _turns(spark, rows)
    assert t[("s1", 1)]["status"] == "completed"
    assert t[("s1", 2)]["status"] == "active"  # unclosed at EOF stays visible


def test_unmatched_post_dropped_and_running_tool_survives(spark):
    rows = [
        _ev(1, "prompt:submit", prompt="p"),
        _ev(2, "tool:post", tool_name="Ghost"),  # no matching pre → ignored
        _ev(3, "tool:pre", tool_name="Slow"),
    ]
    t = _turns(spark, rows)[("s1", 1)]
    (tool,) = t["tools"]
    assert tool["name"] == "Slow"
    assert tool["status"] == "running"  # still running in the active turn


def test_parallel_group_matching_first_running_wins(spark):
    rows = [
        _ev(1, "prompt:submit", prompt="p"),
        _ev(2, "tool:pre", tool_name="T", parallel_group_id="g1"),
        _ev(3, "tool:pre", tool_name="T", parallel_group_id="g2"),
        _ev(
            4,
            "tool:post",
            tool_name="T",
            parallel_group_id="g2",
            result={"success": True, "output": "second", "error": None},
        ),
        _ev(5, "session:end"),
    ]
    t = _turns(spark, rows)[("s1", 1)]
    by_gid = {tool["parallel_group_id"]: tool for tool in t["tools"]}
    assert by_gid["g2"]["status"] == "completed"
    # session closed while g1 still running → reference leaves it "running"
    # (trace_aggregator.py:195-204 never rewrites tool status at close)
    assert by_gid["g1"]["status"] == "running"


def test_error_result_and_truncation(spark):
    long_msg = "x" * 1500
    rows = [
        _ev(1, "prompt:submit", prompt="p"),
        _ev(2, "tool:pre", tool_name="B"),
        _ev(
            3,
            "tool:post",
            tool_name="B",
            result={"success": False, "output": None, "error": {"message": long_msg}},
        ),
        _ev(4, "session:end"),
    ]
    (tool,) = _turns(spark, rows)[("s1", 1)]["tools"]
    assert tool["status"] == "error"
    assert tool["error"].endswith("... (truncated)")
    assert len(tool["error"]) == 1000 + len("... (truncated)")


def test_sub_agent_child_session_extraction(spark):
    rows = [
        _ev(1, "prompt:submit", prompt="p"),
        _ev(
            2,
            "tool:pre",
            tool_name="Task",
            tool_input={"agent": "researcher"},
        ),
        _ev(
            3,
            "tool:post",
            tool_name="Task",
            result={
                "success": True,
                "output": '{"session_id": "child-42"}',
                "error": None,
            },
        ),
        _ev(4, "session:end"),
    ]
    (tool,) = _turns(spark, rows)[("s1", 1)]["tools"]
    assert tool["is_sub_agent"] is True
    assert tool["sub_agent_name"] == "researcher"
    assert tool["child_session_id"] == "child-42"


def test_unparseable_timestamp_maps_to_zero(spark):
    rows = [_ev(1, "prompt:submit", ts="not-a-time", prompt="p")]
    t = _turns(spark, rows)[("s1", 1)]
    assert t["start_time"] == 0


def test_events_before_first_prompt_ignored_and_empty_ok(spark):
    rows = [_ev(1, "tool:pre", tool_name="Early")]
    assert _turns(spark, rows) == {}
    import pandas as pd  # noqa: F401  (empty-group path exercises schema)

    from lakehouse_spark.schemas import TRACE_EVENT as sch

    empty = spark.createDataFrame([], sch)
    assert aggregate_trace(empty).count() == 0


def test_multi_session_independence(spark):
    rows = [
        _ev(1, "prompt:submit", session="a", prompt="pa"),
        _ev(1, "prompt:submit", session="b", prompt="pb"),
        _ev(2, "session:end", session="a"),
    ]
    t = _turns(spark, rows)
    assert t[("a", 1)]["status"] == "completed"
    assert t[("b", 1)]["status"] == "active"


def test_trace_metrics(spark):
    from lakehouse_spark.operators.sessionize import trace_metrics

    rows = [
        _ev(1, "prompt:submit", prompt="p"),
        _ev(2, "tool:pre", "2026-01-01T00:00:01+00:00", tool_name="Fast"),
        _ev(
            3,
            "tool:post",
            "2026-01-01T00:00:02+00:00",
            tool_name="Fast",
            result={"success": True, "output": "o", "error": None},
        ),
        _ev(4, "tool:pre", "2026-01-01T00:00:03+00:00", tool_name="Slow"),
        _ev(
            5,
            "tool:post",
            "2026-01-01T00:00:09+00:00",
            tool_name="Slow",
            result={"success": True, "output": "o", "error": None},
        ),
        _ev(6, "thinking:delta", delta="t1"),
        _ev(7, "session:end"),
    ]
    df = spark.createDataFrame(rows, TRACE_EVENT)
    m = trace_metrics(aggregate_trace(df)).collect()[0].asDict()
    assert m["total_tools"] == 2
    assert m["longest_tool"] == "Slow"
    assert m["max_tool_duration"] == 6000
    assert m["avg_tool_duration"] == 3500
    assert m["total_thinking"] == 1


def test_absent_result_stored_as_empty_string(spark):
    # Reference: result = data.get("result", "") → non-dict → str(result)
    # (trace_aggregator.py:157,177-179): a tool:post with no result payload
    # completes the tool with result "".
    rows = [
        _ev(1, "prompt:submit", prompt="p"),
        _ev(2, "tool:pre", tool_name="B"),
        _ev(3, "tool:post", tool_name="B"),
        _ev(4, "session:end"),
    ]
    (tool,) = _turns(spark, rows)[("s1", 1)]["tools"]
    assert tool["status"] == "completed"
    assert tool["result"] == ""
    assert tool["error"] is None


def test_success_defaults_true_when_absent(spark):
    # result dict without success → result.get("success", True) → completed.
    rows = [
        _ev(1, "prompt:submit", prompt="p"),
        _ev(2, "tool:pre", tool_name="B"),
        _ev(
            3,
            "tool:post",
            tool_name="B",
            result={"success": None, "output": "out", "error": None},
        ),
        _ev(4, "session:end"),
    ]
    (tool,) = _turns(spark, rows)[("s1", 1)]["tools"]
    assert tool["status"] == "completed"
    assert tool["result"] == "out"


def test_child_session_from_dict_output_direct_fold():
    # The reference reads result.output as a DICT and takes its session_id
    # (trace_aggregator.py:160-165). The Spark schema types output as
    # string, so exercise the dict path through the pandas fold directly —
    # the same fold the streaming replay feeds with raw JSON dicts.
    import pandas as pd

    from lakehouse_spark.operators.sessionize import _fold_session

    rows = [
        dict(session_id="s", ts="2026-01-01T00:00:00+00:00", lvl="INFO",
             event="prompt:submit", data={"prompt": "p"}, encounter_seq=1),
        dict(session_id="s", ts="2026-01-01T00:00:01+00:00", lvl="INFO",
             event="tool:pre",
             data={"tool_name": "Task", "tool_input": {"agent": "worker"}},
             encounter_seq=2),
        dict(session_id="s", ts="2026-01-01T00:00:02+00:00", lvl="INFO",
             event="tool:post",
             data={"tool_name": "Task",
                   "result": {"success": True,
                              "output": {"session_id": "child-7"}}},
             encounter_seq=3),
        dict(session_id="s", ts="2026-01-01T00:00:03+00:00", lvl="INFO",
             event="session:end", data={}, encounter_seq=4),
    ]
    out = _fold_session(pd.DataFrame(rows))
    (tool,) = out.iloc[0]["tools"]
    assert tool["sub_agent_name"] == "worker"
    assert tool["child_session_id"] == "child-7"
    # dict output is stored stringified (ref str(result.get("output", "")))
    assert tool["result"] == str({"session_id": "child-7"})


def _parity_events():
    """Event stream exercising every cross-turn coupling the split path must
    restore: tools spanning many turns (global tool ordinals), implicit
    closes (status flip), session:end mid-stream, unmatched posts, thinking,
    trailing active turn, pre-prompt garbage."""
    rows = [_ev(0, "tool:pre", session="sA", tool_name="Ghost")]  # pre-prompt
    seq = 1
    for s, n_turns in (("sA", 4), ("sB", 2)):
        for k in range(n_turns):
            rows.append(_ev(seq, "prompt:submit", session=s, prompt=f"p{k}")); seq += 1
            rows.append(_ev(seq, "tool:pre", session=s, tool_name="Bash")); seq += 1
            if k % 2 == 0:
                rows.append(_ev(seq, "tool:post", session=s, tool_name="Bash",
                                result={"success": True, "output": "ok", "error": None})); seq += 1
                rows.append(_ev(seq, "tool:pre", session=s, tool_name="Read")); seq += 1
            rows.append(_ev(seq, "thinking:delta", session=s, delta=f"t{k}")); seq += 1
            rows.append(_ev(seq, "tool:post", session=s, tool_name="Nope")); seq += 1  # unmatched
        if s == "sB":
            rows.append(_ev(seq, "session:end", session=s)); seq += 1
    return rows


def test_split_by_turn_parity(spark):
    """aggregate_trace(split_by_turn=True) must be byte-identical to the
    single-group fold — including session-global tool ids and the implicit
    'completed' flip on non-final turns."""
    df = spark.createDataFrame(_parity_events(), TRACE_EVENT)

    def snap(out):
        return sorted(
            (r.asDict(recursive=True) for r in out.collect()),
            key=lambda t: (t["session_id"], t["turn_id"]),
        )

    plain = snap(aggregate_trace(df))
    split = snap(aggregate_trace(df, split_by_turn=True))
    assert plain == split
    # sanity on the cross-turn state specifically
    ids = [t["id"] for turn in plain if turn["session_id"] == "sA" for t in turn["tools"]]
    assert ids == [f"tool_{i}" for i in range(1, len(ids) + 1)]
    assert plain[-1]["status"] == "active" or plain[-1]["session_id"] == "sB"


def test_split_by_turn_bounds_giant_session_groups(spark):
    """Skew mitigation: one 20k-event session among many normal ones. The
    split path's pandas groups are keyed by (session, turn), so the largest
    group is one TURN (~10 events), not the giant session; output still
    matches the single-group fold."""
    from pyspark.sql import functions as F

    from lakehouse_spark.operators.sessionize import turn_number

    rows = []
    seq = 0
    for k in range(2000):  # giant session: 2000 turns x 10 events
        rows.append(_ev(seq, "prompt:submit", session="giant", prompt=f"p{k}")); seq += 1
        for j in range(4):
            rows.append(_ev(seq, "tool:pre", session="giant", tool_name=f"T{j}")); seq += 1
            rows.append(_ev(seq, "tool:post", session="giant", tool_name=f"T{j}",
                            result={"success": True, "output": "y", "error": None})); seq += 1
        rows.append(_ev(seq, "thinking:delta", session="giant", delta="d")); seq += 1
    for s in range(50):  # normal sessions
        rows.append(_ev(seq, "prompt:submit", session=f"n{s}", prompt="q")); seq += 1
        rows.append(_ev(seq, "session:end", session=f"n{s}")); seq += 1
    df = spark.createDataFrame(rows, TRACE_EVENT)

    # the split key bounds every pandas group by the largest turn
    seg = turn_number(
        df, "session_id", [F.asc("encounter_seq")],
        F.col("event") == "prompt:submit", out_col="__seg",
    )
    max_group = (
        seg.groupBy("session_id", "__seg").count()
        .agg(F.max("count")).collect()[0][0]
    )
    assert max_group == 10  # one turn, not 20k

    split = aggregate_trace(df, split_by_turn=True)
    assert split.count() == 2050
    giant = {
        r["turn_id"]: r.asDict(recursive=True)
        for r in split.filter(F.col("session_id") == "giant").collect()
    }
    assert len(giant) == 2000
    # non-final turns flipped to completed; final stays active (no session:end)
    assert giant[1]["status"] == "completed"
    assert giant[2000]["status"] == "active"
    # global tool ordinals survive the split: turn k holds tools 4(k-1)+1..4k
    assert [t["id"] for t in giant[3]["tools"]] == [
        "tool_9", "tool_10", "tool_11", "tool_12"
    ]


def test_auto_skew_split_engages_without_caller_flag(spark):
    """The default (split_by_turn=None) probes session sizes and switches to
    the split path on its own when one session exceeds skew_threshold;
    output is identical to the forced single-group fold, and the threshold
    is configurable."""
    rows = []
    seq = 0
    for k in range(1200):  # giant session: 12k events > default 10k threshold
        rows.append(_ev(seq, "prompt:submit", session="giant", prompt=f"p{k}")); seq += 1
        for j in range(4):
            rows.append(_ev(seq, "tool:pre", session="giant", tool_name=f"T{j}")); seq += 1
            rows.append(_ev(seq, "tool:post", session="giant", tool_name=f"T{j}",
                            result={"success": True, "output": "y", "error": None})); seq += 1
        rows.append(_ev(seq, "thinking:delta", session="giant", delta="d")); seq += 1
    for s in range(50):  # normal sessions
        rows.append(_ev(seq, "prompt:submit", session=f"n{s}", prompt="q")); seq += 1
        rows.append(_ev(seq, "session:end", session=f"n{s}")); seq += 1
    df = spark.createDataFrame(rows, TRACE_EVENT)

    def snap(out):
        return sorted(
            (r.asDict(recursive=True) for r in out.collect()),
            key=lambda t: (t["session_id"], t["turn_id"]),
        )

    from lakehouse_spark.operators.sessionize import last_auto_split

    auto = snap(aggregate_trace(df))  # no caller flag
    assert last_auto_split() is True
    forced = snap(aggregate_trace(df, split_by_turn=False))
    assert last_auto_split() is None  # caller decided
    assert auto == forced

    # threshold is configurable: raise it and the probe keeps the plain path
    aggregate_trace(df, skew_threshold=1_000_000).count()
    assert last_auto_split() is False

    # telemetry is PER-THREAD: another thread's probe decision must not
    # leak into (or out of) this one
    import threading

    seen = {}

    def other():
        seen["before"] = last_auto_split()  # fresh thread → None
        aggregate_trace(df, skew_threshold=1_000_000).count()
        seen["after"] = last_auto_split()

    t = threading.Thread(target=other)
    t.start(); t.join()
    assert seen == {"before": None, "after": False}
    assert last_auto_split() is False  # unchanged by the other thread
