"""Round-12 verdict ask #4: the distributed UPDATE/DELETE key-route
(``WHERE key IN (SELECT ...)`` → update(keys=)/delete_keys) must engage on
COLUMN-MAPPED tables (tables that used RENAME COLUMN). The key column
itself can never be renamed (metadata._guard_col_mutation), and the route
speaks logical names end-to-end, so declining on store.renames() only
forced those tables back to the 10k inline cap — and a hard error beyond
it. Pins: key-route parity beyond the inline cap on a renamed clustered
table, identical CDF images, and the delta-doc file-skipping shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark.catalog import LakeCatalog
from lakehouse_spark.mutation import manifest as M
from lakehouse_spark.mutation.store import TableStore
from lakehouse_spark.sqldml import _SUBQ_INLINE_CAP


def _mk_renamed(spark, path, n=30_000, **kw):
    """Clustered store with a renamed non-key column (x -> val)."""
    st = TableStore(spark, str(path), key="id", stats_cols=("id",), **kw)
    st.init(spark.range(n).selectExpr("id", "id AS x", "'a' AS tag"))
    st.rename_column("x", "val")
    assert st.renames()  # the premise of this file
    return st


def test_update_keyroute_renamed_table_beyond_inline_cap(spark, tmp_path):
    """Beyond the inline cap a renamed table used to raise; the key route
    must now engage and agree with the Python update() row for row."""
    n_keys = _SUBQ_INLINE_CAP + 2_000
    a = _mk_renamed(spark, tmp_path / "a")
    b = _mk_renamed(spark, tmp_path / "b")
    cat = LakeCatalog(spark)
    cat.register("ra", store=a)
    out = cat.sql(
        "UPDATE ra SET val = val + 1000000, tag = 'u' "
        f"WHERE id IN (SELECT id FROM ra WHERE id < {n_keys})"
    )
    assert out.collect()[0].affected_rows == n_keys
    b.update(
        set={"val": "val + 1000000", "tag": "'u'"}, where=f"id < {n_keys}"
    )
    rows_a = sorted(tuple(r) for r in a.read().collect())
    rows_b = sorted(tuple(r) for r in b.read().collect())
    assert rows_a == rows_b
    assert sum(1 for r in rows_a if r[2] == "u") == n_keys


def test_delete_keyroute_renamed_table_beyond_inline_cap(spark, tmp_path):
    """DELETE analog: the single key-IN subquery routes to delete_keys on
    a column-mapped table, beyond the cap."""
    n_keys = _SUBQ_INLINE_CAP + 500
    st = _mk_renamed(spark, tmp_path / "t")
    cat = LakeCatalog(spark)
    cat.register("rd", store=st)
    out = cat.sql(
        f"DELETE FROM rd WHERE id IN (SELECT id FROM rd WHERE id < {n_keys})"
    )
    assert out.collect()[0].affected_rows == n_keys
    assert st.read().count() == 30_000 - n_keys
    assert st.read().agg(F.min("id")).collect()[0][0] == n_keys


def test_update_keyroute_renamed_cdf_images_identical(spark, tmp_path):
    """CDF pre/post images of the renamed-table key route equal the Python
    update()'s on the same data (logical column names in the feed)."""
    a = _mk_renamed(spark, tmp_path / "a", n=200, write_cdf=True)
    b = _mk_renamed(spark, tmp_path / "b", n=200, write_cdf=True)
    cat = LakeCatalog(spark)
    cat.register("rc", store=a)
    cat.sql(
        "UPDATE rc SET val = val * 2 "
        "WHERE id IN (SELECT id FROM rc WHERE id BETWEEN 50 AND 59)"
    )
    b.update(set={"val": "val * 2"}, predicate={"id": (50, 59)})
    va, vb = a.current_version(), b.current_version()
    ca = {(r.id, r.val, r._change_type) for r in a.changes(va, va).collect()}
    cb = {(r.id, r.val, r._change_type) for r in b.changes(vb, vb).collect()}
    assert ca == cb
    assert {t for (_, _, t) in ca} == {"update_preimage", "update_postimage"}
    assert len(ca) == 20


def test_update_keyroute_renamed_file_skipping(spark, tmp_path):
    """Only the key-matching segment is rewritten on a renamed clustered
    table: the commit is a delta doc removing exactly one segment, and the
    plain conjunct over the RENAMED column rides along as the row filter."""
    st = TableStore(spark, str(tmp_path / "t"), key="id", stats_cols=("id",))
    st.init(spark.range(0, 20).selectExpr("id", "id AS x", "'a' AS tag"))
    for lo in range(20, 120, 20):
        st.append(
            spark.range(lo, lo + 20).selectExpr("id", "id AS x", "'a' AS tag")
        )
    st.rename_column("x", "val")
    cat = LakeCatalog(spark)
    cat.register("rf", store=st)
    v0 = st.current_version()
    segs0 = st._snapshot(v0)["segments"]
    cat.sql(
        "UPDATE rf SET tag = 'hit' "
        "WHERE id IN (SELECT id FROM rf WHERE id IN (42, 43)) AND val >= 43"
    )
    raw = M.read_manifest_file(str(tmp_path / "t"), st.current_version())
    assert raw.get("delta") == 1
    assert len(raw["remove"]) == 1 and raw["remove"][0] in segs0
    got = {r.id for r in st.read().filter(F.col("tag") == "hit").collect()}
    assert got == {43}
