"""Differential tests: every SQL-expressible catalog query must match the
DuckDB oracle (row count + schema + order-insensitive value hash) — the same
check the driver's correctness gate runs, executed at sf0.001 for speed.
"""

from __future__ import annotations

import pytest

from lakehouse_spark import oracle
from lakehouse_spark.queries import CATALOG

from tests.conftest import SF_SMALL

_NAMES = list(CATALOG)


@pytest.fixture(scope="module")
def duck(spark):
    return oracle.duckdb_connect(SF_SMALL)


@pytest.mark.parametrize("name", _NAMES)
def test_catalog_query_matches_oracle(spark, duck, name):
    spec = CATALOG[name]
    if spec.oracle is None:
        # rows-only check: must run and be non-degenerate
        df = spec.build(spark, SF_SMALL)
        assert df.count() >= 0
        return
    res = oracle.compare(name, spec.build(spark, SF_SMALL), duck, spec.oracle)
    assert res.schema_match, f"{name}: {res.spark_cols} != {res.oracle_cols}"
    assert res.spark_rows == res.oracle_rows, f"{name}: row count mismatch"
    assert res.hash_match, f"{name}: value hash mismatch"


def test_catalog_covers_headline_suite():
    assert sum(s.headline for s in CATALOG.values()) >= 5


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(CATALOG)
