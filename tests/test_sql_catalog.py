"""SQL-by-name catalog (round 8): LakeCatalog registers TableStore roots /
testdata parquet as named views, spark.sql addresses them by name, pushdown
reaches the scans, and — crucially — MIXED-FILTER REUSE of one view is
correct. The naive ``format("lakehouse")``-backed view is not: Spark 4.1
caches the Python data source's planned read per relation unkeyed by pushed
filters (PythonDataSourceV2.readInfo), so a filtered query poisons a later
unfiltered one and a self-join executes one side's filter on both. The
catalog backs views with TableStore.read() (parquet-native) for exactly
that reason — these tests are the regression pin."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from lakehouse_spark.catalog import LakeCatalog
from lakehouse_spark.mutation.store import TableStore
from lakehouse_spark.plans.metrics import plan_metrics
from tests.conftest import SF_SMALL


def _mk_facts(spark, tmp_path, **kw) -> TableStore:
    facts = TableStore(
        spark, str(tmp_path / "facts"), key="id", stats_cols=("x",), **kw
    )
    facts.init(spark.range(100).selectExpr("id", "id AS x", "id % 7 AS d"))
    for i in range(1, 4):  # 4 segments with disjoint x ranges
        facts.append(
            spark.range(i * 100, i * 100 + 100).selectExpr(
                "id", "id AS x", "id % 7 AS d"
            )
        )
    return facts


def test_sql_join_shows_pushed_filters(spark, tmp_path):
    """A SQL join over two registered lakehouse tables: the WHERE is pushed
    into the parquet scan (PushedFilters in the executed plan) and the scan
    emits only row-group-surviving rows, not the table."""
    facts = _mk_facts(spark, tmp_path)
    dims = TableStore(spark, str(tmp_path / "dims"), key="d")
    dims.init(
        spark.createDataFrame(
            [(i, f"name{i}") for i in range(7)], "d long, name string"
        )
    )
    cat = LakeCatalog(spark)
    cat.register("facts", store=facts)
    cat.register("dims", store=dims)

    q = cat.sql(
        """
        SELECT name, CAST(count(*) AS BIGINT) AS n
        FROM facts JOIN dims ON facts.d = dims.d
        WHERE x >= 350 GROUP BY name ORDER BY name
        """
    )
    rows = q.collect()
    assert sum(r.n for r in rows) == 50
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(x,350)" in plan.replace(" ", "").replace(
        "`", ""
    )
    # Row-group stats pruning: each 100-row segment is one row group, so
    # the facts scan emits only the 50 matching rows — IO prune, not just
    # a post-scan Filter.
    per = plan_metrics(q)
    facts_scan = max(
        (
            m["numOutputRows"]
            for k, m in per.items()
            if k.startswith("Scan parquet") and m.get("numOutputRows", 0)
        ),
    )
    assert facts_scan == 50


def test_predicate_registration_prunes_segments(spark, tmp_path):
    """register(predicate=) bakes manifest-stats segment pruning into the
    view: excluded segments' files are never LISTED — proven by deleting
    them from disk and watching every query through the view still run."""
    import json

    facts = _mk_facts(spark, tmp_path)
    cat = LakeCatalog(spark)
    cat.register("hot", store=facts, predicate={"x": (350, None)})
    m = facts._snapshot(facts.current_version())
    doomed = [s for s in m["segments"] if m["stats"][s]["x"][1] < 350]
    assert len(doomed) == 3
    for s in doomed:
        shutil.rmtree(os.path.join(facts.root, s))
    assert cat.sql("SELECT count(*) AS n FROM hot").collect()[0].n == 50
    assert (
        cat.sql("SELECT count(*) AS n FROM hot WHERE x < 380").collect()[0].n
        == 30
    )
    # negative control: a view WITHOUT the predicate must list the dead
    # files and fail — pruning, not lenient listing, explains the above
    with pytest.raises(Exception):
        cat.register("all_facts", store=facts)
        cat.sql("SELECT count(*) AS n FROM all_facts").collect()


def test_mixed_filter_reuse_is_correct(spark, tmp_path):
    """The scenario that breaks a Python-data-source-backed view (upstream
    readInfo cache, see module docstring): filtered-then-unfiltered reuse,
    scalar subqueries with different filters, and a differently-filtered
    self-join — all through ONE registered view — must all be exact."""
    facts = _mk_facts(spark, tmp_path)
    cat = LakeCatalog(spark)
    cat.register("facts", store=facts)
    assert (
        cat.sql("SELECT count(*) n FROM facts WHERE x >= 350").collect()[0].n
        == 50
    )
    # unfiltered after filtered: the poisoned-cache shape returned 50 here
    assert cat.sql("SELECT count(*) n FROM facts").collect()[0].n == 400
    r = cat.sql(
        """
        SELECT (SELECT count(*) FROM facts WHERE x < 50) AS lo,
               (SELECT count(*) FROM facts WHERE x >= 350) AS hi
        """
    ).collect()[0]
    assert (r.lo, r.hi) == (50, 50)
    n = cat.sql(
        """
        SELECT a.id FROM facts a JOIN facts b ON a.id = b.id - 350
        WHERE a.x < 50 AND b.x >= 350
        """
    ).count()
    assert n == 50


def test_dv_and_snapshot_semantics_through_sql(spark, tmp_path):
    """Deletion vectors apply inside the view (merge-on-read anti-join);
    registration pins the snapshot until refresh(); version= time-travels;
    path= opens read-only with the manifest's key."""
    s = TableStore(spark, str(tmp_path / "t"), key="id")
    s.init(spark.range(10).selectExpr("id", "id AS x"))
    s.delete_keys(spark.createDataFrame([(3,), (4,)], "id long"), mode="dv")
    cat = LakeCatalog(spark)
    cat.register("t", path=s.root)  # path form: key read from manifest
    assert cat.sql("SELECT count(*) n FROM t").collect()[0].n == 8
    s.append(spark.range(10, 15).selectExpr("id", "id AS x"))
    # view pins the registration-time snapshot …
    assert cat.sql("SELECT count(*) n FROM t").collect()[0].n == 8
    # … until refresh re-resolves the head
    cat.refresh("t")
    assert cat.sql("SELECT count(*) n FROM t").collect()[0].n == 13
    cat.register("t_v0", store=s, version=0)
    assert cat.sql("SELECT count(*) n FROM t_v0").collect()[0].n == 10
    cat.refresh("t_v0")  # pinned version: refresh is a no-op
    assert cat.sql("SELECT count(*) n FROM t_v0").collect()[0].n == 10
    assert cat.names() == ["t", "t_v0"]
    cat.unregister("t_v0")
    with pytest.raises(KeyError, match="no table"):
        cat.table("t_v0")
    with pytest.raises(ValueError, match="exactly one"):
        cat.register("x")
    with pytest.raises(ValueError, match="exactly one"):
        cat.register("x", path="/p", store=s)
    with pytest.raises(ValueError, match="only apply"):
        cat.register("x", df=spark.range(1), version=0)


def test_sql_front_entries_match_dataframe_twins(spark):
    """The catalog entries sql_front_q3/q5 run the oracle's ANSI-SQL text
    through spark.sql; their rows must equal the DataFrame twins exactly
    (same aliases, same values) — the SQL front-end is not a dialect."""
    from lakehouse_spark.queries import CATALOG

    for sql_name, df_name in (
        ("sql_front_q3", "tpch_q3_shipping_priority"),
        ("sql_front_q5", "tpch_q5_local_supplier_volume"),
    ):
        a = CATALOG[sql_name].build(spark, SF_SMALL)
        b = CATALOG[df_name].build(spark, SF_SMALL)
        assert a.columns == b.columns
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb, f"{sql_name} != {df_name}"


def test_changes_view_through_sql(spark, tmp_path):
    """changes=True registers the change feed as a named relation —
    Delta's table_changes(...) TVF as a SQL view: _change_type /
    _commit_version queryable by name, range pinned at registration,
    refresh() extends a default-range view to the new head."""
    s = TableStore(spark, str(tmp_path / "c"), key="id", write_cdf=True)
    s.init(spark.range(5).selectExpr("id", "id AS x"))
    s.upsert(spark.createDataFrame([(1, 99)], "id long, x long"))
    cat = LakeCatalog(spark)
    cat.register("t_changes", store=s, changes=True)
    got = cat.sql(
        """
        SELECT _change_type, CAST(count(*) AS BIGINT) AS n
        FROM t_changes GROUP BY 1 ORDER BY 1
        """
    ).collect()
    assert {(r._change_type, r.n) for r in got} == {
        ("insert", 5),
        ("update_preimage", 1),
        ("update_postimage", 1),
    }
    # pinned at registration; refresh extends to the new head
    s.delete_keys(spark.createDataFrame([(2,)], "id long"), mode="dv")
    assert (
        cat.sql(
            "SELECT count(*) n FROM t_changes WHERE _change_type = 'delete'"
        ).collect()[0].n
        == 0
    )
    cat.refresh("t_changes")
    assert (
        cat.sql(
            "SELECT count(*) n FROM t_changes WHERE _change_type = 'delete'"
        ).collect()[0].n
        == 1
    )
    # option guard
    with pytest.raises(ValueError, match="changes=True"):
        cat.register("bad", store=s, changes=True, version=0)
