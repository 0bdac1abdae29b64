"""Round-11 verdict ask #3: UPDATE ... WHERE key IN (SELECT ...) routes
DISTRIBUTED (update(keys=frame), semi-join matching, no inline-literal
cap), as DELETE already does via delete_keys. Pins the three done
criteria: parity with the Python update() call at >10k keys, identical
CDF pre/post images, and key-stats file skipping on a clustered table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_spark.catalog import LakeCatalog
from lakehouse_spark.mutation import manifest as M
from lakehouse_spark.mutation.store import TableStore
from lakehouse_spark.sqldml import _SUBQ_INLINE_CAP


def _mk(spark, path, n=30_000, **kw):
    st = TableStore(spark, str(path), key="id", stats_cols=("id",), **kw)
    st.init(spark.range(n).selectExpr("id", "id AS x", "'a' AS tag"))
    return st


def test_update_subquery_beyond_inline_cap_matches_python_update(
    spark, tmp_path
):
    """>10k distinct subquery values: the old inline route raised at the
    cap; the key route must succeed and agree with the equivalent Python
    update() row for row."""
    n_keys = _SUBQ_INLINE_CAP + 2_000
    a = _mk(spark, tmp_path / "a")
    b = _mk(spark, tmp_path / "b")
    cat = LakeCatalog(spark)
    cat.register("ta", store=a)
    out = cat.sql(
        "UPDATE ta SET x = x + 1000000, tag = 'u' "
        f"WHERE id IN (SELECT id FROM ta WHERE id < {n_keys})"
    )
    assert out.collect()[0].affected_rows == n_keys
    b.update(set={"x": "x + 1000000", "tag": "'u'"}, where=f"id < {n_keys}")
    rows_a = sorted(tuple(r) for r in a.read().collect())
    rows_b = sorted(tuple(r) for r in b.read().collect())
    assert rows_a == rows_b
    assert sum(1 for r in rows_a if r[2] == "u") == n_keys


def test_update_subquery_cdf_images_identical(spark, tmp_path):
    """CDF pre/post images of the subquery route equal the Python
    update()'s on the same data."""
    a = _mk(spark, tmp_path / "a", n=200, write_cdf=True)
    b = _mk(spark, tmp_path / "b", n=200, write_cdf=True)
    cat = LakeCatalog(spark)
    cat.register("tc", store=a)
    cat.sql(
        "UPDATE tc SET x = x * 2 "
        "WHERE id IN (SELECT id FROM tc WHERE id BETWEEN 50 AND 59)"
    )
    b.update(set={"x": "x * 2"}, predicate={"id": (50, 59)})
    va, vb = a.current_version(), b.current_version()
    ca = {
        (r.id, r.x, r._change_type) for r in a.changes(va, va).collect()
    }
    cb = {
        (r.id, r.x, r._change_type) for r in b.changes(vb, vb).collect()
    }
    assert ca == cb
    assert {t for (_, _, t) in ca} == {"update_preimage", "update_postimage"}
    assert len(ca) == 20  # 10 pre + 10 post


def test_update_subquery_file_skipping_on_clustered_table(spark, tmp_path):
    """Only the key-matching segment is rewritten: the commit is a delta
    doc removing exactly one of the table's segments."""
    st = TableStore(spark, str(tmp_path / "t"), key="id", stats_cols=("id",))
    st.init(spark.range(0, 20).selectExpr("id", "id AS x", "'a' AS tag"))
    for lo in range(20, 120, 20):
        st.append(
            spark.range(lo, lo + 20).selectExpr("id", "id AS x", "'a' AS tag")
        )
    cat = LakeCatalog(spark)
    cat.register("tf", store=st)
    v0 = st.current_version()
    segs0 = st._snapshot(v0)["segments"]
    cat.sql(
        "UPDATE tf SET tag = 'hit' "
        "WHERE id IN (SELECT id FROM tf WHERE id IN (42, 43))"
    )
    raw = M.read_manifest_file(str(tmp_path / "t"), st.current_version())
    assert raw.get("delta") == 1
    assert len(raw["remove"]) == 1 and raw["remove"][0] in segs0
    got = {r.id for r in st.read().filter(F.col("tag") == "hit").collect()}
    assert got == {42, 43}


def test_update_subquery_with_plain_conjunct(spark, tmp_path):
    """Key-IN subquery composes with extra plain AND conjuncts: they ride
    along as the row filter on the distributed route."""
    st = _mk(spark, tmp_path / "t", n=100)
    cat = LakeCatalog(spark)
    cat.register("tp", store=st)
    out = cat.sql(
        "UPDATE tp SET tag = 'e' "
        "WHERE id IN (SELECT id FROM tp WHERE id < 10) AND x % 2 = 0"
    )
    assert out.collect()[0].affected_rows == 5
    got = sorted(
        r.id for r in st.read().filter(F.col("tag") == "e").collect()
    )
    assert got == [0, 2, 4, 6, 8]


def test_update_subquery_or_precedence_falls_back_inline(spark, tmp_path):
    """``sub AND a OR b`` must keep SQL precedence ((sub AND a) OR b) —
    the key route would mis-scope it, so it falls back to the in-place
    inline rewrite."""
    st = _mk(spark, tmp_path / "t", n=50)
    cat = LakeCatalog(spark)
    cat.register("tq", store=st)
    out = cat.sql(
        "UPDATE tq SET tag = 'o' "
        "WHERE id IN (SELECT id FROM tq WHERE id < 3) AND x = 2 OR id = 49"
    )
    # (id in {0,1,2} AND x=2) OR id=49 -> rows 2 and 49.
    assert out.collect()[0].affected_rows == 2
    got = sorted(
        r.id for r in st.read().filter(F.col("tag") == "o").collect()
    )
    assert got == [2, 49]


def test_update_not_in_subquery_still_inline(spark, tmp_path):
    """NOT IN on the key keeps the three-valued inline semantics (no key
    route)."""
    st = _mk(spark, tmp_path / "t", n=20)
    cat = LakeCatalog(spark)
    cat.register("tn", store=st)
    out = cat.sql(
        "UPDATE tn SET tag = 'k' "
        "WHERE id NOT IN (SELECT id FROM tn WHERE id >= 5)"
    )
    assert out.collect()[0].affected_rows == 5
    got = sorted(
        r.id for r in st.read().filter(F.col("tag") == "k").collect()
    )
    assert got == [0, 1, 2, 3, 4]
