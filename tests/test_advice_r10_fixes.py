"""Round-10 ADVICE regression pins.

1. catalog.py — re-registering a name to a DIFFERENT store purges the
   cached ``name__asof_*`` time-travel aliases (stale alias would serve
   the OLD store's snapshot to ``VERSION AS OF``).
2. catalog.py — TIMESTAMP AS OF aliases are hash-keyed (collision-proof
   for punctuation-variant strings) and capped per base name (no
   unbounded temp-view accumulation); two different TIMESTAMP clauses in
   one query resolve independently.
3. table_layout.py — ``maybe_compact(small_bytes=)`` caches per-segment
   sizes (segments are immutable once written) and skips the re-probe
   entirely while the head hasn't moved after a nothing-to-fold probe.
4. sqldml.py — an INSERT column list naming a column not in the table
   schema raises instead of silently dropping that column's data in the
   OVERWRITE null-fill projection.
"""

from __future__ import annotations

import time

import pytest

from lakehouse_spark.catalog import LakeCatalog
from lakehouse_spark.mutation.store import TableStore


def _mk(spark, path, n=100, start=0):
    st = TableStore(spark, str(path), key="id", stats_cols=("x",))
    st.init(spark.range(start, start + n).selectExpr("id", "id AS x"))
    return st


def test_reregister_purges_stale_asof_aliases(spark, tmp_path):
    """The ADVICE repro: register(t, A), VERSION AS OF 0 (100 rows),
    register(t, B) (7 rows at v0) — the same query must now see B's v0."""
    a = _mk(spark, tmp_path / "a", n=100)
    b = _mk(spark, tmp_path / "b", n=7)
    cat = LakeCatalog(spark)
    cat.register("t", store=a)
    q = "SELECT CAST(count(*) AS BIGINT) AS n FROM t VERSION AS OF 0"
    assert cat.sql(q).collect()[0].n == 100
    cat.register("t", store=b)
    assert cat.sql(q).collect()[0].n == 7
    # DataFrame re-registration over a store name purges too.
    cat.register("t", df=spark.range(3))
    assert not any(k.startswith("t__asof_") for k in cat._entries)


def test_reregister_same_store_keeps_aliases(spark, tmp_path):
    """refresh()/follow_head re-register the SAME store — the immutable
    version pins stay cached (no purge, no rebuild)."""
    a = _mk(spark, tmp_path / "a", n=10)
    cat = LakeCatalog(spark)
    cat.register("t", store=a)
    cat.sql("SELECT * FROM t VERSION AS OF 0")
    aliases = {k for k in cat._entries if k.startswith("t__asof_")}
    assert aliases
    cat.refresh("t")
    assert aliases <= set(cat._entries)


def test_two_timestamp_clauses_one_query(spark, tmp_path):
    st = _mk(spark, tmp_path / "t", n=100)
    t0 = time.time() + 0.01
    time.sleep(0.05)
    st.append(spark.range(100, 200).selectExpr("id", "id AS x"))
    t1 = time.time() + 0.01
    cat = LakeCatalog(spark)
    cat.register("tt", store=st)
    row = cat.sql(
        f"SELECT (SELECT count(*) FROM tt TIMESTAMP AS OF '{t0}') AS a, "
        f"(SELECT count(*) FROM tt TIMESTAMP AS OF '{t1}') AS b"
    ).collect()[0]
    assert (row.a, row.b) == (100, 200)


def test_timestamp_alias_reuse_and_cap(spark, tmp_path):
    st = _mk(spark, tmp_path / "t", n=10)
    base = time.time() + 0.01
    cat = LakeCatalog(spark)
    cat.register("tt", store=st)
    # Same string twice -> one alias (re-resolved, not re-accumulated).
    cat.sql(f"SELECT count(*) FROM tt TIMESTAMP AS OF '{base}'")
    cat.sql(f"SELECT count(*) FROM tt TIMESTAMP AS OF '{base}'")
    assert len(cat._ts_aliases["tt"]) == 1
    # 12 distinct strings -> capped at 8 live aliases, all queries green.
    for i in range(12):
        n = cat.sql(
            f"SELECT count(*) AS n FROM tt TIMESTAMP AS OF '{base + i * 1e-4}'"
        ).collect()[0].n
        assert n == 10
    assert len(cat._ts_aliases["tt"]) == 8
    live = {k for k in cat._entries if k.startswith("tt__asof_t")}
    assert live == set(cat._ts_aliases["tt"])
    # unregister drops the bookkeeping with the aliases.
    cat.unregister("tt")
    assert "tt" not in cat._ts_aliases


def test_maybe_compact_small_bytes_probe_skips_until_new_version(
    spark, tmp_path
):
    st = TableStore(spark, str(tmp_path / "t"), key="id")
    st.init(spark.range(50).selectExpr("id"))
    for i in range(1, 4):
        st.append(spark.range(i * 50, i * 50 + 50).selectExpr("id"))
    calls = []
    orig = st.compact_small

    def spy(**kw):
        calls.append(kw)
        return orig(**kw)

    st.compact_small = spy
    # All 4 segments are "large" under a 1-byte threshold: probe runs,
    # finds nothing foldable, and the noop is remembered at this head.
    assert st.maybe_compact(max_segments=2, small_bytes=1) is False
    assert len(calls) == 1
    assert st.maybe_compact(max_segments=2, small_bytes=1) is False
    assert len(calls) == 1  # same head: no re-probe
    assert st._segsize_cache  # sizes cached by segment name
    # A new commit resets the skip — and with a generous threshold the
    # fold actually runs.
    st.append(spark.range(200, 250).selectExpr("id"))
    assert st.maybe_compact(max_segments=2, small_bytes=1 << 30) is True
    assert len(calls) >= 2
    assert st.read().count() == 250


def test_insert_unknown_column_raises(spark, tmp_path):
    st = _mk(spark, tmp_path / "t", n=5)
    cat = LakeCatalog(spark)
    cat.register("t", store=st)
    for mode in ("INTO", "OVERWRITE"):
        with pytest.raises(ValueError, match="not in t's schema"):
            cat.sql(f"INSERT {mode} t (id, nope) VALUES (99, 1)")
    # Table unchanged, both columns intact.
    assert st.read().count() == 5
    assert set(st.read().columns) == {"id", "x"}
    # A valid partial list on OVERWRITE still null-fills the rest.
    cat.sql("INSERT OVERWRITE t (id) VALUES (7)")
    row = st.read().collect()[0]
    assert (row.id, row.x) == (7, None)
