"""Round-11 ADVICE regression pins.

1. sqldml.py — ``_sql_literal`` escapes backslashes BEFORE quote-doubling:
   Spark's default parser processes backslash escapes in string literals,
   so 'a\\nb' used to round-trip to a newline and a trailing backslash made
   the rewritten WHERE unparseable (the inlined IN-list then targeted the
   wrong rows).
2. catalog.py — the TIMESTAMP AS OF alias FIFO never evicts an alias
   minted for the statement currently being rewritten: a single query with
   >8 distinct timestamps on one table used to drop a temp view its own
   rewritten SQL still referenced.
3. mutation/manifest.py — the abort handler's ``current_version()`` probe
   is retried and can no longer REPLACE the original exception: a transient
   pointer-read failure used to escape, skipping the claim release (slot
   wedged until orphan-grace stealing).
"""

from __future__ import annotations

import pytest

from lakehouse_spark.catalog import LakeCatalog
from lakehouse_spark.mutation.store import TableStore
from lakehouse_spark.sqldml import _sql_literal


# -- 1. backslash-safe literals ------------------------------------------


@pytest.mark.parametrize(
    "val",
    [
        "a\\nb",            # would become a newline under escape processing
        "C:\\new\\table",   # the ADVICE repro
        "trailing\\",       # used to break the parse outright
        "mix'quote\\and\\'both",
        "\\\\double",
    ],
)
def test_sql_literal_backslash_roundtrip(spark, val):
    lit = _sql_literal(val)
    got = spark.sql(f"SELECT {lit} AS v").collect()[0].v
    assert got == val


def test_sql_literal_backslash_in_dml_where(spark, tmp_path):
    """End-to-end: a DELETE whose inlined IN-list carries backslash values
    must delete exactly those rows (not escape-mangled variants)."""
    st = TableStore(spark, str(tmp_path / "t"), key="k")
    st.init(
        spark.createDataFrame(
            [("C:\\new\\table", 1), ("a\\nb", 2), ("a\nb", 3), ("plain", 4)],
            "k string, x int",
        )
    )
    cat = LakeCatalog(spark)
    cat.register("bslash", store=st)
    cat.sql(
        "DELETE FROM bslash WHERE k IN "
        "(SELECT k FROM bslash WHERE x IN (1, 2))"
    )
    left = {r.k for r in st.read().collect()}
    # The literal-backslash rows (x=1,2) are gone; the REAL-newline row
    # (x=3) — which the old escaping conflated with x=2 — survives.
    assert left == {"a\nb", "plain"}


# -- 2. >8 distinct timestamps in one statement ----------------------------


def test_many_timestamps_one_statement_no_self_evict(spark, tmp_path):
    st = TableStore(spark, str(tmp_path / "t"), key="id")
    st.init(spark.range(1).selectExpr("id"))
    ts = []
    for i in range(10):
        st.append(spark.range(100 + i, 101 + i).selectExpr("id"))
        ts.append(st.commit_timestamp(st.current_version()))
    import datetime as _dt

    iso = [
        _dt.datetime.fromtimestamp(t + 0.0005).isoformat() for t in ts
    ]
    cat = LakeCatalog(spark)
    cat.register("t", store=st)
    # One statement referencing 10 distinct timestamps of the same table:
    # every asof view must survive until execution.
    parts = [
        f"SELECT CAST(count(*) AS BIGINT) AS n FROM t TIMESTAMP AS OF '{s}'"
        for s in iso
    ]
    q = " UNION ALL ".join(parts)
    rows = [r.n for r in cat.sql(q).collect()]
    assert rows == list(range(2, 12))
    # The NEXT statement drains the fifo back under the cap.
    cat.sql(f"SELECT * FROM t TIMESTAMP AS OF '{iso[-1]}'").collect()
    assert len(cat._ts_aliases["t"]) <= 8


# -- 3. abort-path pointer probe ------------------------------------------


def test_abort_probe_failure_keeps_original_error_and_releases_slot(
    spark, tmp_path
):
    st = TableStore(spark, str(tmp_path / "t"), key="id")
    st.init(spark.range(5).selectExpr("id"))

    real_cv = type(st).current_version
    calls = {"poison": 0}

    class Boom(RuntimeError):
        pass

    def flaky_cv(self):
        # Fail the abort handler's first probe attempts (transient OSError
        # shape); the retry loop must recover and still release the claim.
        if calls["poison"] > 0:
            calls["poison"] -= 1
            raise OSError("transient pointer read failure")
        return real_cv(self)

    def exploding_make(v):
        calls["poison"] = 2  # poison the NEXT two current_version reads
        raise Boom("segment build failed")

    st.current_version = flaky_cv.__get__(st)
    try:
        with pytest.raises(Boom):
            st._transact(exploding_make)
    finally:
        del st.current_version
    # Slot released: a follow-up append commits cleanly at the same slot.
    v0 = st.current_version()
    st.append(spark.range(10, 12).selectExpr("id"))
    assert st.current_version() == v0 + 1
    assert st.read().count() == 7
