"""SC7-SC9 file sources, the config-compilation plane, and the automation
scheduling layer."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from lakehouse_spark.mutation import automations as auto
from lakehouse_spark.mutation.store import TableStore
from lakehouse_spark.plans import config
from lakehouse_spark.sources import files


# --- SC7/SC8/SC9 -------------------------------------------------------------


def _tree(tmp_path):
    (tmp_path / "a" / "b").mkdir(parents=True)
    (tmp_path / "a" / ".hidden").mkdir()
    (tmp_path / "a" / "metadata.json").write_text("{}")
    (tmp_path / "a" / "b" / "metadata.json").write_text("{}")
    (tmp_path / "a" / "b" / "notes.md").write_text("hello **world**")
    (tmp_path / "a" / "b" / "big.md").write_text("x" * 2048)
    (tmp_path / "a" / "b" / "binary.bin").write_bytes(b"\x00\x01")
    return tmp_path


def test_discover_marker_files_depth_cap(spark, tmp_path):
    root = str(_tree(tmp_path))
    found = files.discover_marker_files(spark, root, "metadata.json")
    rels = sorted(r.rel_path for r in found.collect())
    assert rels == ["a", "a/b"]
    depths = {r.rel_path: r.depth for r in found.collect()}
    assert depths == {"a": 1, "a/b": 2}
    shallow = files.discover_marker_files(spark, root, "metadata.json", max_depth=1)
    assert [r.rel_path for r in shallow.collect()] == ["a"]


def test_list_dir_hidden_and_sort(spark, tmp_path):
    _tree(tmp_path)
    got = [(r.name, r.is_directory) for r in files.list_dir(spark, str(tmp_path / "a")).collect()]
    assert got == [("b", True), ("metadata.json", False)]  # dir first, no .hidden


def test_read_gated_files(spark, tmp_path):
    root = str(_tree(tmp_path))
    got = {r.path.split("/")[-1]: r.content for r in files.read_gated_files(
        spark, root, allowed_extensions=(".md",), max_bytes=1024
    ).collect()}
    assert got == {"notes.md": "hello **world**"}  # big.md capped, .bin off-list


# --- O8 / T15 / T16 / D2 (config plane) ---------------------------------------


def test_toposort_orders_dependencies_first():
    order = config.toposort(
        ["app", "base", "mid"], {"app": ["mid"], "mid": ["base"], "base": []}
    )
    assert order == ["base", "mid", "app"]
    # unknown deps ignored; encounter order breaks ties
    assert config.toposort(["b", "a"], {"a": ["zz"], "b": []}) == ["b", "a"]


def test_toposort_cycle_raises():
    with pytest.raises(config.DependencyCycleError, match="a"):
        config.toposort(["a", "b"], {"a": ["b"], "b": ["a"]})


def test_deep_merge_semantics():
    base = {"a": {"x": 1, "y": [1, 2]}, "keep": "me"}
    over = {"a": {"y": [9], "z": 3}, "new": True}
    got = config.deep_merge(base, over)
    assert got == {"a": {"x": 1, "y": [9], "z": 3}, "keep": "me", "new": True}
    assert base["a"]["y"] == [1, 2]  # inputs not mutated


def test_compile_mount_plan_end_to_end():
    behaviors = {
        "base": {
            "config": {"t1.mode": "fast", "hook.h1.level": "info", "shared": {"a": 1}},
            "tools": [{"id": "t1", "src": "base"}],
            "hooks": [{"id": "h1"}],
        },
        "app": {
            "config": {"shared": {"b": 2}},
            "tools": [{"id": "t1", "src": "app"}, {"id": "t2"}],
            "hooks": [],
        },
    }
    plan = config.compile_mount_plan(behaviors, {"app": ["base"], "base": []})
    assert plan["order"] == ["base", "app"]
    assert plan["config"]["shared"] == {"a": 1, "b": 2}  # deep merge
    assert [t["id"] for t in plan["tools"]] == ["t1", "t2"]
    assert plan["tools"][0]["src"] == "base"  # first-wins in dependency order
    assert plan["tools"][0]["config"] == {"mode": "fast"}  # prefix overlay
    assert plan["hooks"][0]["config"] == {"level": "info"}  # hook.{id} prefix


# --- CR1-CR4 (automation layer) ------------------------------------------------


NOW = datetime(2026, 1, 15, 10, 30, tzinfo=timezone.utc)

AUTO_SCHEMA = (
    "id string, project_id string, name string, message string, "
    "schedule_type string, schedule_value string, enabled boolean, "
    "last_execution timestamp, next_execution timestamp"
)


def _automations(spark):
    rows = [
        ("a1", "p", "daily", "m", "cron", "0 9 * * *", True, None, None),
        ("a2", "p", "halfhour", "m", "interval", "30m", True, None, None),
        ("a3", "p", "disabled", "m", "cron", "0 9 * * *", False, None, None),
        ("a4", "p", "bad", "m", "cron", "nope", True, None, None),
    ]
    return spark.createDataFrame(rows, AUTO_SCHEMA)


def test_next_execution_and_due(spark):
    df = auto.with_next_execution(_automations(spark), NOW)
    nxt = {r.id: r.next_execution for r in df.collect()}
    assert nxt["a1"] == datetime(2026, 1, 16, 9, 0)
    assert nxt["a2"] == datetime(2026, 1, 15, 11, 0)
    assert nxt["a3"] is None  # disabled → unscheduled
    assert nxt["a4"] is None  # invalid expr → NULL, not an exception

    later = datetime(2026, 1, 15, 11, 30, tzinfo=timezone.utc)
    due = auto.due_automations(df, later)
    assert [r.id for r in due.collect()] == ["a2"]


def test_record_execution_roundtrip(spark, tmp_path):
    astore = TableStore(spark, str(tmp_path / "autos"), key="id")
    xstore = TableStore(spark, str(tmp_path / "execs"), key="id")
    astore.init(auto.with_next_execution(_automations(spark), NOW))

    fired_at = datetime(2026, 1, 15, 11, 0, tzinfo=timezone.utc)
    execution = spark.createDataFrame(
        [("e1", "a2", "s1", fired_at.replace(tzinfo=None), "success", None)],
        "id string, automation_id string, session_id string, "
        "executed_at timestamp, status string, error string",
    )
    auto.record_execution(astore, xstore, execution, fired_at)

    assert xstore.read().count() == 1
    a2 = {r.id: r for r in astore.read().collect()}["a2"]
    assert a2.last_execution == datetime(2026, 1, 15, 11, 0)
    assert a2.next_execution == datetime(2026, 1, 15, 11, 30)  # 30m after fire
    # untouched rows keep their schedule
    assert {r.id for r in astore.read().collect()} == {"a1", "a2", "a3", "a4"}

    hist = auto.execution_history(xstore.read(), "a2")
    assert [r.id for r in hist.collect()] == ["e1"]


def test_automation_manager_crud_lifecycle(spark, tmp_path):
    """CR4 + CR1 round-trip: create → due → execute → record → recompute,
    unique-name enforcement, replace-on-update, disabled → unscheduled."""
    from lakehouse_spark.schemas import EXECUTION

    mgr = auto.AutomationManager(
        TableStore(spark, str(tmp_path / "autos"), key="id"),
        TableStore(spark, str(tmp_path / "execs"), key="id"),
    )

    a1 = mgr.create("a1", "projA", "daily", "run it", "cron", "0 9 * * *", NOW)
    assert a1.next_execution == datetime(2026, 1, 16, 9, 0)  # scheduled on create
    mgr.create("a2", "projA", "halfhour", "m", "interval", "30m", NOW)
    # same name in ANOTHER project is fine; same project raises
    mgr.create("a3", "projB", "daily", "m", "cron", "0 9 * * *", NOW)
    with pytest.raises(ValueError, match="already exists"):
        mgr.create("a4", "projA", "daily", "m", "cron", "0 9 * * *", NOW)
    with pytest.raises(ValueError, match="already exists"):
        mgr.update("a2", NOW, name="daily")
    with pytest.raises(ValueError, match="not found"):
        mgr.update("ghost", NOW, name="x")

    # due-set at 11:30: only the 30m interval (next = 11:00) has arrived
    later = datetime(2026, 1, 15, 11, 30, tzinfo=timezone.utc)
    assert [r.id for r in mgr.due(later).collect()] == ["a2"]

    # execute + record: last_execution stamped, next_execution recomputed
    execution = spark.createDataFrame(
        [("e1", "a2", "s1", later.replace(tzinfo=None), "success", None, 1)],
        EXECUTION,
    )
    mgr.record_execution(execution, later)
    a2 = mgr.get("a2")
    assert a2.last_execution == datetime(2026, 1, 15, 11, 30)
    assert a2.next_execution == datetime(2026, 1, 15, 12, 0)

    # replace-on-update: schedule edit recomputes next fire
    a1 = mgr.update("a1", later, schedule_value="0 6 * * *")
    assert a1.next_execution == datetime(2026, 1, 16, 6, 0)
    assert a1.updated_at == datetime(2026, 1, 15, 11, 30)

    # disabled → unscheduled (NULL next_execution) and excluded from due-set
    a2 = mgr.toggle("a2", False, later)
    assert a2.enabled is False and a2.next_execution is None
    far = datetime(2026, 2, 1, tzinfo=timezone.utc)
    assert "a2" not in {r.id for r in mgr.due(far).collect()}
    # re-enable re-registers
    a2 = mgr.toggle("a2", True, later)
    assert a2.next_execution == datetime(2026, 1, 15, 12, 0)

    # list filters
    assert {r.id for r in mgr.list(project_id="projA").collect()} == {"a1", "a2"}
    assert {r.id for r in mgr.list(enabled=True).collect()} == {"a1", "a2", "a3"}

    # delete removes the automation and its history
    assert mgr.delete("a2") is True
    assert mgr.get("a2") is None
    execs = mgr.executions.read()
    assert execs.filter(execs.automation_id == "a2").count() == 0
    assert mgr.delete("ghost") is False

    # reload_all: bulk recompute (startup path)
    mgr.reload_all(far)
    a1 = mgr.get("a1")
    assert a1.next_execution == datetime(2026, 2, 1, 6, 0)


def test_scheduler_tick_fires_records_and_reschedules(spark, tmp_path):
    """tick(): the complete fire loop — due automations execute via the
    callback, executions land with ids/sequence, last/next_execution
    advance, and an immediate second tick at the same instant fires
    nothing (the reschedule makes re-firing impossible)."""
    from datetime import datetime, timezone

    from lakehouse_spark.mutation.automations import AutomationManager
    from lakehouse_spark.mutation.store import TableStore

    NOW = datetime(2026, 1, 15, 10, 0, tzinfo=timezone.utc)
    mgr = AutomationManager(
        TableStore(spark, str(tmp_path / "a"), "id"),
        TableStore(spark, str(tmp_path / "x"), "id"),
    )
    mgr.create("t1", "proj", "hourly", "go", "interval", "1h", NOW)
    mgr.create("t2", "proj", "daily", "go", "cron", "0 23 * * *", NOW)
    mgr.reload_all(NOW)  # daemon startup: register everything

    later = datetime(2026, 1, 15, 11, 0, tzinfo=timezone.utc)
    ran = []

    def run(a):
        ran.append(a.id)
        return (f"sess-{a.id}", "success", None)

    assert mgr.tick(later, run) == 1  # only the hourly interval is due
    assert ran == ["t1"]
    execs = mgr.executions.read().collect()
    assert len(execs) == 1 and execs[0].session_id == "sess-t1"
    t1 = mgr.get("t1")
    assert t1.last_execution == datetime(2026, 1, 15, 11, 0)
    assert t1.next_execution == datetime(2026, 1, 15, 12, 0)

    assert mgr.tick(later, run) == 0  # rescheduled: nothing re-fires
    assert len(ran) == 1

    # failure path recorded verbatim, schedule still advances
    noon = datetime(2026, 1, 15, 12, 0, tzinfo=timezone.utc)
    assert mgr.tick(noon, lambda a: (None, "failed", "boom")) == 1
    last = sorted(mgr.executions.read().collect(), key=lambda r: r.encounter_seq)[-1]
    assert (last.status, last.error) == ("failed", "boom")
    assert mgr.get("t1").next_execution == datetime(2026, 1, 15, 13, 0)


def test_cluster_conf_sizing_invariants():
    from lakehouse_spark.session import cluster_conf

    import pytest

    conf = cluster_conf(data_tb=100, executors=1000, cores_per_executor=4,
                        executor_mem_gb=16)
    parts = int(conf["spark.sql.shuffle.partitions"])
    # 100 TB / 3 at ~200 MB per partition ≈ 187k partitions — and never
    # below 2x total cores
    assert parts >= 2 * 1000 * 4
    assert 150_000 <= parts <= 250_000
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.adaptive.skewJoin.enabled"] == "true"

    # small data still keeps every core busy
    small = cluster_conf(data_tb=0.001, executors=10, cores_per_executor=4)
    assert int(small["spark.sql.shuffle.partitions"]) == 80

    # memory-starved layout is rejected with the sizing math in the message
    with pytest.raises(ValueError, match="working memory"):
        cluster_conf(data_tb=1, executors=10, cores_per_executor=32,
                     executor_mem_gb=8)
