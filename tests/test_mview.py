"""Incremental materialized-view maintenance: the view after any chain of
base commits must equal a from-scratch recompute EXACTLY (decimal sums —
no tolerance), groups must appear/disappear as their counts cross zero,
and an up-to-date view must not commit a new version."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_spark.mutation.mview import MaterializedAgg
from lakehouse_spark.mutation.store import TableStore


@pytest.fixture()
def base(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "base"), key="id")
    store.init(
        spark.createDataFrame(
            [(1, "a", 10.5), (2, "a", 2.25), (3, "b", 1.0)],
            "id long, grp string, amount double",
        )
    )
    return store


def _mk(spark, tmp_path, base):
    return MaterializedAgg(
        spark, str(tmp_path / "view"), base, ["grp"], sum_cols=("amount",)
    )


def _expected(base):
    return {
        r.grp: (r.n, float(r.s))
        for r in base.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("amount").cast("decimal(28,6)")).alias("s"),
        )
        .collect()
    }


def _got(view):
    return {r.grp: (r.n, float(r.sum_amount)) for r in view.read().collect()}


def test_initial_refresh_matches_recompute(spark, tmp_path, base):
    mv = _mk(spark, tmp_path, base)
    v = mv.refresh()
    assert v == base.current_version()
    assert _got(mv) == _expected(base) == {"a": (2, 12.75), "b": (1, 1.0)}


def test_incremental_append(spark, tmp_path, base):
    mv = _mk(spark, tmp_path, base)
    mv.refresh()
    base.append(
        spark.createDataFrame(
            [(4, "b", 3.5), (5, "c", 7.0)], "id long, grp string, amount double"
        )
    )
    mv.refresh()
    assert _got(mv) == _expected(base) == {
        "a": (2, 12.75),
        "b": (2, 4.5),
        "c": (1, 7.0),
    }


def test_incremental_delete_drops_empty_group(spark, tmp_path, base):
    mv = _mk(spark, tmp_path, base)
    mv.refresh()
    base.delete_keys(spark.createDataFrame([(3,)], "id long"))
    mv.refresh()
    got = _got(mv)
    assert got == _expected(base)
    assert "b" not in got  # count reached zero → group removed


def test_mixed_churn_stays_exact(spark, tmp_path, base):
    mv = _mk(spark, tmp_path, base)
    mv.refresh()
    base.append(
        spark.createDataFrame([(6, "a", 0.125)], "id long, grp string, amount double")
    )
    mv.refresh()
    base.delete_keys(spark.createDataFrame([(1,), (6,)], "id long"))
    base.append(
        spark.createDataFrame([(7, "d", -4.75)], "id long, grp string, amount double")
    )
    mv.refresh()
    assert _got(mv) == _expected(base)


def test_noop_refresh_commits_nothing(spark, tmp_path, base):
    mv = _mk(spark, tmp_path, base)
    mv.refresh()
    v_view = mv.view.current_version()
    mv.refresh()  # base unchanged
    assert mv.view.current_version() == v_view


def test_full_refresh_recovers(spark, tmp_path, base):
    mv = _mk(spark, tmp_path, base)
    mv.refresh()
    base.append(
        spark.createDataFrame([(8, "e", 5.0)], "id long, grp string, amount double")
    )
    mv.refresh(full=True)
    assert _got(mv) == _expected(base)
    assert mv.base_version_reflected() == base.current_version()


def test_continuous_agg_sink_streaming(spark, tmp_path):
    """Streaming ingestion keeps the materialized view current: after an
    availableNow run the view equals a recompute over everything ingested,
    and a full checkpoint replay changes nothing (exactly-once)."""
    import json as _json

    from lakehouse_spark.streaming.live import continuous_agg_sink

    rows = [
        {"id": 1, "grp": "a", "amount": 1.5},
        {"id": 2, "grp": "a", "amount": 2.5},
        {"id": 3, "grp": "b", "amount": 4.0},
    ]
    src = tmp_path / "src"
    src.mkdir()
    (src / "r.jsonl").write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    schema = "id long, grp string, amount double"

    base = TableStore(spark, str(tmp_path / "cagg_base"), key="id")
    mv = MaterializedAgg(
        spark, str(tmp_path / "cagg_view"), base, ["grp"], sum_cols=("amount",)
    )

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream.writeStream.foreachBatch(continuous_agg_sink(base, mv))
            .option("checkpointLocation", str(tmp_path / "cagg_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert _got(mv) == _expected(base) == {"a": (2, 4.0), "b": (1, 4.0)}
    v_base, v_view = base.current_version(), mv.view.current_version()

    # New file + second run: view advances incrementally.
    (src / "r2.jsonl").write_text(
        _json.dumps({"id": 4, "grp": "b", "amount": 6.0}) + "\n"
    )
    run()
    assert _got(mv) == _expected(base) == {"a": (2, 4.0), "b": (2, 10.0)}

    # Replay from a WIPED checkpoint: txn watermark must reject the replayed
    # batches — no double counting, no new versions.
    import shutil

    v_base2, v_view2 = base.current_version(), mv.view.current_version()
    assert v_base2 == v_base + 1 and v_view2 == v_view + 1
    shutil.rmtree(tmp_path / "cagg_ckpt")
    run()
    assert base.current_version() == v_base2
    assert _got(mv) == {"a": (2, 4.0), "b": (2, 10.0)}


def test_store_schema_evolution_and_history(spark, tmp_path):
    """Additive schema evolution: appending a segment with a new column
    must surface the column table-wide (old rows read null), and history()
    exposes the commit log with meta/txn."""
    store = TableStore(spark, str(tmp_path / "evo"), key="id")
    store.init(
        spark.createDataFrame([(1, "a")], "id long, grp string"),
        meta={"origin": "init"},
    )
    store.append(
        spark.createDataFrame(
            [(2, "b", 0.5)], "id long, grp string, score double"
        )
    )
    got = {r.id: (r.grp, r.score) for r in store.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 0.5)}

    h = store.history()
    assert [e["version"] for e in h] == [1, 0]
    assert h[1]["meta"] == {"origin": "init"}
    assert h[0]["n_segments"] == 2

    # time travel still sees the pre-evolution schema
    assert store.read(0).columns == ["id", "grp"]


def test_scd2_history_reconstruction(spark, tmp_path):
    """SCD2 intervals from the version log: an upsert closes the old row
    value and opens the new one; a delete closes without reopening; a
    re-inserted identical row opens a SECOND interval for the same
    identity."""
    from lakehouse_spark.mutation.scd import scd2_history

    store = TableStore(spark, str(tmp_path / "dim"), key="id")
    store.init(
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "id long, val string"
        )
    )  # v0
    store.upsert(spark.createDataFrame([(1, "alpha2")], "id long, val string"))  # v1
    store.delete_keys(spark.createDataFrame([(2,)], "id long"))  # v2
    store.append(spark.createDataFrame([(2, "beta")], "id long, val string"))  # v3

    hist = {
        (r.id, r.val, r.valid_from): (r.valid_to, r.is_current)
        for r in scd2_history(store).collect()
    }
    assert hist[(1, "alpha", 0)] == (1, False)     # closed by the upsert
    assert hist[(1, "alpha2", 1)] == (None, True)
    assert hist[(2, "beta", 0)] == (2, False)      # closed by the delete
    assert hist[(2, "beta", 3)] == (None, True)    # re-inserted → new interval
    assert len(hist) == 4

    # Sanity: current rows of the history == the head version's rows.
    cur = {
        (r.id, r.val)
        for r in scd2_history(store).filter("is_current").collect()
    }
    head = {(r.id, r.val) for r in store.read().collect()}
    assert cur == head


def test_as_of_version_join_no_leakage(spark, tmp_path):
    """Facts observed at version v must see the dim value live AT v —
    never a later upsert (time-travel leakage) and never an earlier
    closed value."""
    from lakehouse_spark.mutation.scd import as_of_version_join, scd2_history

    store = TableStore(spark, str(tmp_path / "ptd"), key="id")
    store.init(spark.createDataFrame([(1, "v0")], "id long, val string"))  # v0
    store.upsert(spark.createDataFrame([(1, "v1")], "id long, val string"))  # v1
    store.upsert(spark.createDataFrame([(1, "v2")], "id long, val string"))  # v2

    hist = scd2_history(store)
    facts = spark.createDataFrame(
        [(100, 1, 0), (101, 1, 1), (102, 1, 2), (103, 2, 1)],
        "fact_id long, id long, observed_v long",
    )
    out = {
        r.fact_id: r.val
        for r in as_of_version_join(facts, hist, "id", "observed_v").collect()
    }
    assert out == {100: "v0", 101: "v1", 102: "v2", 103: None}


def test_scd2_after_vacuum_skips_missing_versions(spark, tmp_path):
    """scd2_history over a vacuumed store: intervals are computed across
    the RETAINED versions only (consecutive retained pair diffs still see
    every net change), and current rows still equal the head."""
    from lakehouse_spark.mutation.scd import scd2_history

    store = TableStore(spark, str(tmp_path / "vac"), key="id")
    store.init(spark.createDataFrame([(1, "a")], "id long, val string"))   # v0
    store.upsert(spark.createDataFrame([(1, "b")], "id long, val string"))  # v1
    store.upsert(spark.createDataFrame([(1, "c")], "id long, val string"))  # v2
    store.upsert(spark.createDataFrame([(1, "d")], "id long, val string"))  # v3
    store.vacuum(keep_last=2)  # only v2, v3 retained

    hist = {
        (r.val, r.valid_from): (r.valid_to, r.is_current)
        for r in scd2_history(store).collect()
    }
    # v2 is the oldest retained snapshot: 'c' opens there; the v2->v3 diff
    # closes it and opens 'd'. Vacuumed intermediate states (a, b) are
    # genuinely unrecoverable and must NOT appear as phantom intervals.
    assert hist == {("c", 2): (3, False), ("d", 3): (None, True)}
    cur = {r.val for r in scd2_history(store).filter("is_current").collect()}
    assert cur == {r.val for r in store.read().collect()}


def test_restore_rolls_back_without_rewriting(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "rb"), key="id")
    store.init(spark.createDataFrame([(1, "good")], "id long, val string"))  # v0
    store.upsert(spark.createDataFrame([(1, "bad")], "id long, val string"))  # v1
    v = store.restore(0)  # v2 references v0's segments
    assert v == 2
    assert [r.val for r in store.read().collect()] == ["good"]
    # history keeps the bad commit inspectable and stamps provenance
    h = {e["version"]: e for e in store.history()}
    assert h[2]["meta"] == {"restored_from": 0}
    assert [r.val for r in store.read(1).collect()] == ["bad"]
    # a restore of a vacuumed version must fail loudly
    store.upsert(spark.createDataFrame([(1, "e")], "id long, val string"))  # v3
    store.vacuum(keep_last=1)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        store.restore(0)


def test_plan_metrics_observability(spark):
    """collect_with_metrics surfaces the executed plan's SQL metrics: the
    shuffle carried exactly the partial-aggregate rows (map-side combine
    proof IN NUMBERS, not plan shape), nothing spilled, and per-operator
    detail resolves the scan and both aggregate phases."""
    from pyspark.sql import functions as F

    from lakehouse_spark.io import load_table
    from lakehouse_spark.plans.metrics import collect_with_metrics, plan_metrics

    df = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    rows, totals = collect_with_metrics(df)
    n_groups = len(rows)
    # map-side combine: the shuffle moves one row per (group x map task),
    # bounded far below the input rows and at least the group count
    assert n_groups <= totals["shuffleRecordsWritten"] < totals["numOutputRows"]
    assert totals["spillSize"] == 0
    assert totals["numFiles"] >= 1
    per = plan_metrics(df)
    assert any(k.startswith("Scan parquet") for k in per)
    assert sum(1 for k in per if k.startswith("HashAggregate")) == 2


def test_automation_tick_drives_mview_refresh(spark, tmp_path, base):
    """Scheduling plane driving the data plane: a cron automation whose
    run() refreshes the materialized view. After base-table churn, one
    scheduler tick brings the view current and records the execution."""
    from datetime import datetime, timezone

    from lakehouse_spark.mutation.automations import AutomationManager

    mv = _mk(spark, tmp_path, base)
    mv.refresh()
    base.append(
        spark.createDataFrame(
            [(9, "z", 2.5)], "id long, grp string, amount double"
        )
    )
    assert mv.base_version_reflected() != base.current_version()  # stale

    autos = TableStore(spark, str(tmp_path / "autos"), key="id")
    execs = TableStore(spark, str(tmp_path / "execs"), key="id")
    mgr = AutomationManager(autos, execs)
    mgr.create(
        "auto-1",
        "proj",
        "refresh-mview",
        "refresh the aggregates view",
        "interval",
        "5m",
        now=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )

    def run(automation):
        v = mv.refresh()
        return (f"mview@v{v}", "success", None)

    fired = mgr.tick(datetime(2026, 1, 1, 0, 6, tzinfo=timezone.utc), run=run)
    assert fired == 1
    assert mv.base_version_reflected() == base.current_version()
    assert _got(mv) == _expected(base)
    ex = mgr.executions.read().collect()
    assert len(ex) == 1 and ex[0].status == "success"
    assert ex[0].session_id.startswith("mview@v")


def test_dynamic_partition_pruning_prunes_fact_scan(spark, tmp_path):
    """DPP: joining a date-partitioned fact against a FILTERED dim must
    inject a runtime partition filter into the fact scan — the fact reads
    only the dim's surviving days, visible both in the plan
    (dynamicpruning) and in the scan metrics (partitions/rows read)."""
    from pyspark.sql import functions as F

    from lakehouse_spark.io import load_table
    from lakehouse_spark.plans.metrics import plan_metrics
    from lakehouse_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "ev_by_day")
    write_partitioned(ev, path, "day", derive_from=F.to_date("ts"))
    fact = read_partitioned(spark, path)
    n_days = fact.select("day").distinct().count()
    assert n_days > 5

    dim_all = fact.select("day").distinct().withColumn(
        "label", F.concat(F.lit("d:"), F.col("day").cast("string"))
    )
    dim = dim_all.filter(F.dayofmonth("day") <= 2)  # few surviving days
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        joined = fact.join(dim.hint("merge"), "day").groupBy("label").count()
        joined.collect()
        per = plan_metrics(joined)
        scans = [v for k, v in per.items() if k.startswith("Scan parquet")]
        fact_scan = max(scans, key=lambda m: m.get("numOutputRows", 0))
        n_selected_days = dim.count()
        # the fact scan read only the surviving partitions' rows
        expected = (
            fact.join(F.broadcast(dim.select("day")), "day", "left_semi").count()
        )
        assert fact_scan["numOutputRows"] == expected
        assert fact_scan["numPartitions"] == n_selected_days < n_days
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )


def test_aqe_coalesces_small_shuffle(spark):
    """AQE folds the 32 configured shuffle partitions of a tiny aggregate
    into a handful at runtime — read from the executed plan's
    numCoalescedPartitions/numPartitions metrics, the mechanism that keeps
    small intermediate stages from paying 32-task overhead while huge ones
    still fan out."""
    from pyspark.sql import functions as F

    from lakehouse_spark.io import load_table
    from lakehouse_spark.plans.metrics import plan_metrics

    df = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    df.collect()
    per = plan_metrics(df)
    read = next(
        (v for k, v in per.items() if k.startswith("AQEShuffleRead")), None
    )
    assert read is not None, sorted(per)
    assert read["numPartitions"] < int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_incremental_refresh_from_stored_cdc(spark, tmp_path):
    """A write_cdf base serves rewrite commits from stored change files:
    refresh over an upsert+delete range must equal the recompute exactly,
    and must have taken the changes() path (assert every version in the
    range is CDC-servable)."""
    store = TableStore(
        spark, str(tmp_path / "cdcbase"), key="id", write_cdf=True
    )
    store.init(
        spark.createDataFrame(
            [(1, "a", 10.5), (2, "a", 2.25), (3, "b", 1.0)],
            "id long, grp string, amount double",
        )
    )
    mv = _mk(spark, tmp_path, store)
    mv.refresh()
    store.upsert(
        spark.createDataFrame(
            [(2, "b", 4.0), (9, "c", 7.0)], "id long, grp string, amount double"
        )
    )
    store.delete_keys(spark.createDataFrame([(1,)], "id long"))
    assert all(
        store.has_cdf(v)
        for v in range(mv.base_version_reflected() + 1, store.current_version() + 1)
    ), "rewrites must be CDC-servable with write_cdf=True"
    mv.refresh()
    assert _got(mv) == _expected(store)
    assert mv.base_version_reflected() == store.current_version()
