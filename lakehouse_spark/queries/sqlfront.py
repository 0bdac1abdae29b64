"""SQL-by-name front-end entries (round 8).

The reference addresses every entity by NAME over its API
(``amplifierd/routers/sessions.py:753-1406`` — "sessions", "events", never a
path); :mod:`lakehouse_spark.catalog` gives the Spark engine the same
name-addressed surface. These entries run ONE ANSI-SQL string through
``LakeCatalog.sql`` over registered views — and, because the string is
engine-portable, the SAME text is the DuckDB oracle. A hash match here
proves the SQL front-end is not a second dialect: ``spark.sql`` over the
catalog and the DataFrame twins (tpch_q3/q5) produce byte-identical result
hashes.

Pushdown through the view boundary (filters reaching the lakehouse data
source's segment pruning) is pinned separately in tests/test_sql_catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_spark.catalog import LakeCatalog
from lakehouse_spark.queries._core import CATALOG, _q

# One portable SQL text per entry: Spark runs it via the catalog, DuckDB as
# the oracle. Decimal-sum rounding keeps both engines order-independent
# (see _core._dsum).
_Q3_SQL = CATALOG["tpch_q3_shipping_priority"].oracle
_Q5_SQL = CATALOG["tpch_q5_local_supplier_volume"].oracle

_PARAM_SQL = """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '{lo}'
      AND o_orderdate <  TIMESTAMP '{hi}'
      AND o_orderstatus = '{status}'
    GROUP BY n_name
"""


def _cat(spark: SparkSession, sf_dir: str) -> LakeCatalog:
    cat = LakeCatalog(spark)
    cat.register_testdata(
        sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    return cat


@_q(
    "sql_front_q3",
    _Q3_SQL,
    doc="TPC-H Q3 through the SQL-by-name front-end: the EXACT oracle text "
    "runs on Spark via LakeCatalog.sql over registered views — hash must "
    "match the DataFrame twin tpch_q3_shipping_priority",
)
def sql_front_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cat(spark, sf_dir).sql(_Q3_SQL)


@_q(
    "sql_front_q5",
    _Q5_SQL,
    doc="TPC-H Q5 (6-way join) through the SQL-by-name front-end, same "
    "portable SQL text both engines",
)
def sql_front_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cat(spark, sf_dir).sql(_Q5_SQL)


@_q(
    "sql_front_named_params",
    _PARAM_SQL.format(lo="1997-01-01", hi="1998-01-01", status="F"),
    doc="Named-parameter SQL join through the catalog: parameters bind as "
    "Catalyst literals (injection-safe), so constant folding and pushdown "
    "apply; the oracle inlines the same literals",
)
def sql_front_named_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _cat(spark, sf_dir)
    return cat.sql(
        """
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= CAST(:lo AS TIMESTAMP)
          AND o_orderdate < CAST(:hi AS TIMESTAMP)
          AND o_orderstatus = :status
        GROUP BY n_name
        """,
        args={
            "lo": "1997-01-01 00:00:00",
            "hi": "1998-01-01 00:00:00",
            "status": "F",
        },
    )
