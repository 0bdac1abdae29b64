"""Round-7 store ergonomics at scale:

- IN-list predicates in read()/DML predicate dicts ({col: [v1, v2]}),
  pruning through manifest stats, partition values, AND bloom sidecars,
  with read(predicate=p) ≡ read().filter(p) exactness throughout;
- compact(where=...) — Delta's OPTIMIZE WHERE: maintenance scoped to the
  matching partitions, everything else carried by reference;
- maybe_compact's deletion-vector pressure trigger (each outstanding dv
  costs every read one anti-join; the cadence call now bounds that too).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F

from lakehouse_spark.mutation.store import TableStore


def _manifest(store, v=None):
    v = store.current_version() if v is None else v
    # Round 9: manifests are per-commit deltas; assert on the snapshot.
    return store._snapshot(v)


# -- IN-list predicates -------------------------------------------------------


def test_in_list_prunes_stats_and_stays_exact(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "t"), key="id", stats_cols=("id",))
    s.init(spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id long, v string"))
    for lo in (100, 200, 300):
        s.append(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(100)], "id long, v string"
            )
        )
    hit = s.read(predicate={"id": [5, 307]})
    assert sorted(r.v for r in hit.collect()) == ["v307", "v5"]
    # only the two segments whose ranges contain the values are read
    assert len(hit.inputFiles()) < len(s.read().inputFiles())
    # equivalence with the plain filter — always
    assert sorted(map(tuple, hit.collect())) == sorted(
        map(tuple, s.read().filter(F.col("id").isin(5, 307)).collect())
    )
    # empty IN matches nothing and reads nothing
    empty = s.read(predicate={"id": []})
    assert empty.count() == 0
    # NULL values in the set never match (SQL IN semantics)
    assert s.read(predicate={"id": [None, 5]}).count() == 1


def test_in_list_probes_bloom_sidecars(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "b"), key="id", bloom_cols=("id",))
    # stride-4 interleaved ids: min/max spans everything, only blooms prune
    for off in range(4):
        s.append(
            spark.createDataFrame(
                [(i * 4 + off, f"v{i * 4 + off}") for i in range(100)],
                "id long, v string",
            )
        )
    # both values live in the off=2 segment only
    hit = s.read(predicate={"id": [42, 46]})
    assert sorted(r.v for r in hit.collect()) == ["v42", "v46"]
    assert len(hit.inputFiles()) < len(s.read().inputFiles())
    # all values provably absent -> zero segments survive
    assert s.read(predicate={"id": [5001, 5002]}).count() == 0


def test_in_list_prunes_partitions(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "p"), key="id", partition_by=("day",))
    rows = [(i, dt.date(2024, 1, 1 + (i % 4)), f"v{i}") for i in range(12)]
    s.init(spark.createDataFrame(rows, "id long, day date, v string"))
    hit = s.read(
        predicate={"day": [dt.date(2024, 1, 1), dt.date(2024, 1, 3)]}
    )
    assert sorted(r.id for r in hit.collect()) == [0, 2, 4, 6, 8, 10]
    assert len(hit.inputFiles()) < len(s.read().inputFiles())
    # mixed ISO-string spelling still matches (canonical compare)
    assert s.read(predicate={"day": ["2024-01-02"]}).count() == 3


def test_in_list_drives_overwrite_where(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "ow"), key="id", partition_by=("day",))
    rows = [(i, f"d{i % 3}", f"v{i}") for i in range(9)]
    s.init(spark.createDataFrame(rows, "id long, day string, v string"))
    before = _manifest(s)["segments"]
    repl = spark.createDataFrame(
        [(100, "d0", "NEW"), (101, "d2", "NEW2")], "id long, day string, v string"
    )
    s.overwrite_where(repl, {"day": ["d0", "d2"]})
    after = _manifest(s)["segments"]
    # d1's segment reused by reference; d0/d2 replaced
    assert len([x for x in after if x in before]) == 1
    assert sorted(r.id for r in s.read().collect()) == [1, 4, 7, 100, 101]


# -- OPTIMIZE WHERE -----------------------------------------------------------


def test_compact_where_scopes_to_matching_partitions(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "w"), key="id", partition_by=("day",))
    for k in range(3):  # 3 appends x 3 days = 9 segments
        s.append(
            spark.createDataFrame(
                [(100 * k + j, f"d{j}", k) for j in range(3)],
                "id long, day string, x long",
            )
        )
    before = _manifest(s)
    assert len(before["segments"]) == 9
    d1_before = {
        seg for seg in before["segments"]
        if before["partitions"][seg]["day"] != "d1"
    }
    s.compact(where={"day": "d1"})
    m = _manifest(s)
    # d0/d2 segments carried BY REFERENCE (6), d1 folded to one
    assert d1_before <= set(m["segments"])
    assert len(m["segments"]) == 7
    assert s.read().count() == 9
    # IN-list scope too, with clustering
    s.compact(where={"day": ["d0", "d2"]}, range_by="id", n_segments=2)
    assert s.read().count() == 9
    # nothing in scope -> no commit at all
    v = s.current_version()
    assert s.compact(where={"day": "nope"}) == v
    assert s.current_version() == v


def test_compact_where_requires_partitioned_table(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "u"), key="id")
    s.init(spark.createDataFrame([(1, "a")], "id long, v string"))
    with pytest.raises(ValueError, match="unpartitioned"):
        s.compact(where={"v": "a"})


# -- maybe_compact dv pressure ------------------------------------------------


def test_maybe_compact_triggers_on_dv_pressure(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "dv"), key="id", stats_cols=("id",))
    s.init(
        spark.createDataFrame([(i, f"v{i}") for i in range(50)], "id long, v string")
    )
    for i in range(3):  # 3 dv-delete commits, segments stay put
        s.delete_keys(spark.createDataFrame([(i,)], "id long"), mode="dv")
    assert len(_manifest(s).get("dv", {})) == 3
    # segment count is tiny, but dv pressure crosses the bound
    assert not s.maybe_compact(max_segments=16, max_dv=8)
    assert s.maybe_compact(max_segments=16, max_dv=2)
    m = _manifest(s)
    assert m.get("dv", {}) == {}  # folded and retired
    assert s.read().count() == 47


# -- cross-feature interplay ---------------------------------------------------


def test_update_accepts_in_list_predicate(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "up"), key="id", stats_cols=("id",))
    s.init(
        spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(20)], "id long, v string, n long"
        )
    )
    n = s.update({"n": "n + 1"}, predicate={"id": [3, 7, 999]})
    assert n == 2
    got = {r.id: r.n for r in s.read().collect()}
    assert got[3] == 1 and got[7] == 1 and got[5] == 0


def test_delete_where_respects_column_mapping(spark, tmp_path):
    """WHERE arrives in LOGICAL names after a rename; the rewrite must
    filter on them and write physical, with the survivors still readable
    under the logical schema."""
    s = TableStore(spark, str(tmp_path / "cm"), key="id")
    s.init(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, v string, x long",
        )
    )
    s.rename_column("x", "amount")
    assert s.delete_where(where="amount >= 20") == 2
    got = s.read()
    assert got.columns == ["id", "v", "amount"]
    assert [(r.id, r.amount) for r in got.collect()] == [(1, 10)]
