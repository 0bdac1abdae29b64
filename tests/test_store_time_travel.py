"""TIMESTAMP AS OF time travel: version_at resolves an instant to the
latest commit at-or-before it over MONOTONIZED commit times (writer clock
skew can't reorder history), read(as_of=)/restore(as_of=) ride on it, and
the Python data source exposes the same via option("timestampAsOf", ...).
Mirrors Delta's timestamp resolution rules (pre-table-creation errors,
post-head timestamps resolve to head)."""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pytest

from lakehouse_spark.mutation.store import TableStore


def _set_committed_at(root: str, v: int, ts: float) -> None:
    path = os.path.join(root, f"_manifest_{v:06d}.json")
    with open(path) as f:
        m = json.load(f)
    m["committed_at"] = ts
    with open(path, "w") as f:
        json.dump(m, f)


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "t"), key="id")
    s.init(spark.createDataFrame([(1, "v0")], "id long, tag string"))
    s.append(spark.createDataFrame([(2, "v1")], "id long, tag string"))
    s.append(spark.createDataFrame([(3, "v2")], "id long, tag string"))
    # Deterministic commit times: 1000.0, 2000.0, 3000.0 epoch seconds.
    for v, ts in enumerate((1000.0, 2000.0, 3000.0)):
        _set_committed_at(s.root, v, ts)
    return s


def test_version_at_boundaries(store):
    assert store.version_at(1000.0) == 0  # exact commit instant included
    assert store.version_at(1999.9) == 0
    assert store.version_at(2000.0) == 1
    assert store.version_at(10_000.0) == 2  # after head → head
    with pytest.raises(ValueError, match="precedes the earliest"):
        store.version_at(999.9)


def test_read_as_of_and_formats(store):
    assert store.read(as_of=2500.0).count() == 2
    # ISO-8601 string resolves through fromisoformat.
    iso = datetime.fromtimestamp(2500.0, tz=timezone.utc).isoformat()
    assert store.read(as_of=iso).count() == 2
    # datetime object.
    dt = datetime.fromtimestamp(1500.0, tz=timezone.utc)
    assert {r.tag for r in store.read(as_of=dt).collect()} == {"v0"}
    with pytest.raises(ValueError, match="not both"):
        store.read(version=1, as_of=2500.0)


def test_clock_skew_monotonized(store):
    # v1's writer clock reads BEFORE v0's commit: its effective time is
    # bumped to eff(v0)+1ms, so no instant observes v1 while denying v0.
    _set_committed_at(store.root, 1, 500.0)
    assert store.version_at(1000.0) == 0
    assert store.version_at(1000.002) == 1
    assert store.version_at(3000.0) == 2


def test_restore_as_of(spark, store):
    v = store.restore(as_of=1500.0)
    assert v == 3
    assert {r.tag for r in store.read().collect()} == {"v0"}
    assert store.version_meta(v) == {"restored_from": 0}
    with pytest.raises(ValueError, match="exactly one"):
        store.restore()


def test_history_carries_committed_at(store):
    hist = store.history()
    assert [h["committed_at"] for h in hist] == [3000.0, 2000.0, 1000.0]


def test_pre_committed_at_manifests_fall_back_to_mtime(store):
    # Strip the field from v0 (a manifest written before it existed) and
    # pin the file mtime: commit_timestamp must use the mtime.
    path = os.path.join(store.root, "_manifest_000000.json")
    with open(path) as f:
        m = json.load(f)
    del m["committed_at"]
    with open(path, "w") as f:
        json.dump(m, f)
    os.utime(path, (1234.0, 1234.0))
    assert store.commit_timestamp(0) == 1234.0


def test_datasource_timestamp_as_of(spark, store):
    df = (
        spark.read.format("lakehouse")
        .option("timestampAsOf", "2500.0")
        .load(store.root)
    )
    assert df.count() == 2
    iso = datetime.fromtimestamp(1500.0, tz=timezone.utc).isoformat()
    df = (
        spark.read.format("lakehouse")
        .option("timestampAsOf", iso)
        .load(store.root)
    )
    assert [r.tag for r in df.collect()] == ["v0"]
    with pytest.raises(Exception, match="not both"):
        (
            spark.read.format("lakehouse")
            .option("timestampAsOf", "2500.0")
            .option("version", "1")
            .load(store.root)
            .count()
        )


# -- round-7: RESTORE rolls back table STATE, not just data -------------------


def test_restore_brings_back_renamed_and_dropped_columns(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "rs"), key="id")
    s.init(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, v string, x long"
        )
    )
    v0 = s.current_version()
    s.rename_column("v", "val")
    s.drop_column("x")
    assert s.read().columns == ["id", "val"]
    s.restore(version=v0)
    # the old logical schema is back — Delta RESTORE restores metadata too
    got = s.read()
    assert got.columns == ["id", "v", "x"]
    assert sorted((r.id, r.v, r.x) for r in got.collect()) == [
        (1, "a", 10), (2, "b", 20),
    ]
    # and the rename era is still inspectable via time travel
    assert "val" in s.read(version=v0 + 1).columns


def test_restore_drops_later_constraints_and_generated(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "rc"), key="id")
    s.init(spark.createDataFrame([(1, 5, 10)], "id long, g long, g2 long"))
    v0 = s.current_version()
    s.add_constraint("pos", "g > 0")
    s.set_generated("g2", "g * 2")
    s.restore(version=v0)
    assert s.constraints() == {}
    assert s.generated_columns() == {}
    # a write the dropped constraint would have rejected now lands
    s.append(spark.createDataFrame([(2, -1, 0)], "id long, g long, g2 long"))
    assert s.read().count() == 2


def test_restore_across_repartition_restores_layout(spark, tmp_path):
    s = TableStore(
        spark, str(tmp_path / "rp"), key="id", partition_by=("day",)
    )
    rows = [(i, f"d{i % 3}", i % 2) for i in range(12)]
    s.init(spark.createDataFrame(rows, "id long, day string, g int"))
    v0 = s.current_version()
    s.repartition_table(("g",))
    assert s.partition_cols() == ("g",)
    s.restore(version=v0)
    # declared layout AND per-segment partition values are the old era's:
    # partition pruning on day works again
    assert s.partition_cols() == ("day",)
    hit = s.read(predicate={"day": "d1"})
    assert sorted(r.id for r in hit.collect()) == [1, 4, 7, 10]
    assert len(hit.inputFiles()) < len(s.read().inputFiles())
    # and new writes split on day again
    s.append(spark.createDataFrame([(100, "d9", 0)], "id long, day string, g int"))
    assert s.read(predicate={"day": "d9"}).count() == 1


def test_restore_recovers_stats_head_forgot(spark, tmp_path):
    """Segments the head no longer references (compacted away between the
    restored version and now) must get their min/max back from the
    restored manifest — otherwise pruning silently degrades after every
    rollback across an OPTIMIZE."""
    s = TableStore(spark, str(tmp_path / "st"), key="id", stats_cols=("id",))
    s.init(spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id long, v string"))
    s.append(spark.createDataFrame([(200 + i, f"w{i}") for i in range(100)], "id long, v string"))
    v1 = s.current_version()
    pruned_before = len(s.read(predicate={"id": (0, 50)}).inputFiles())
    s.compact()  # head forgets the two original segments
    s.restore(version=v1)
    hit = s.read(predicate={"id": (0, 50)})
    assert len(hit.inputFiles()) == pruned_before  # stats back, pruning back
    assert hit.count() == 51


def test_vacuum_sweeps_orphaned_cdc_tmp_debris(spark, tmp_path):
    """A writer that dies mid-materialize leaves a _cdcNNNNNN.tmp.<pid>
    dir (the atomic-rename never ran). Vacuum reclaims it once it is
    older than the orphan grace window — and never touches a fresh one,
    which may belong to a commit in flight."""
    import os
    import time

    s = TableStore(
        spark, str(tmp_path / "t"), key="id", orphan_grace_sec=0.5
    )
    s.init(spark.createDataFrame([(1, "a")], "id long, v string"))
    s.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    stale = os.path.join(s.root, "_cdc000009.tmp.999.888")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-x.parquet"), "w") as f:
        f.write("junk")
    fresh = os.path.join(s.root, "_cdc000010.tmp.111.222")
    os.makedirs(fresh)
    time.sleep(0.6)  # stale ages past the grace window
    os.utime(fresh)  # fresh stays fresh
    rep = s.vacuum(keep_last=10)
    assert "_cdc000009.tmp.999.888" in rep["names"]
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # live writer's in-flight dir untouched
    assert s.read().count() == 2
