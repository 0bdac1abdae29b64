"""Query catalog: every implemented operator as a named (Spark builder,
DuckDB oracle SQL) pair over the driver's testdata tables.

This is the correctness gate's contract (see __spark_entry__.py): the driver
runs each builder on Spark and the oracle SQL on DuckDB at sf0.01 and
compares row counts, schemas, and order-insensitive value hashes.

Cross-engine determinism rules applied throughout:
- every aggregate/computed column is aliased IDENTICALLY on both sides;
- every float is rounded (4 decimals; 6 for cosine) on BOTH sides;
- every LIMIT sits on a TOTAL order (explicit tie-break columns);
- sums of integers are cast to BIGINT on the DuckDB side (DuckDB widens to
  INT128 where Spark stays INT64);
- row_number outputs are cast to INTEGER on the DuckDB side (Spark emits
  INT32);
- the shared 60-bit hash is md5-based: Spark `conv(substr(md5(x),1,15),16,10)`
  == DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` (functions.scalar.hash64).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_spark.functions.scalar import truncate_payload
from lakehouse_spark.io import load_table
from lakehouse_spark.operators import (
    aggregates,
    dedup,
    filters,
    joins,
    similarity,
    sorts,
    text,
)
from lakehouse_spark.operators.sessionize import (
    pair_tool_events,
    turn_number,
    turn_stats,
)
from lakehouse_spark.plans import closure


@dataclass
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    headline: bool = False  # include in bench.py timing suite
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def _q(name: str, oracle: str | None, headline: bool = False, doc: str = ""):
    def reg(fn):
        CATALOG[name] = QuerySpec(fn, oracle, headline, doc)
        return fn

    return reg


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dsum(col, digits: int = 2):
    """Order-independent rounded sum for money/quantity columns.

    Double summation order is schedule-dependent (partial-aggregate combine
    order varies with partitioning), so round(sum(double), 2) can flip a
    cent between runs/engines whenever a group's true sum sits near a
    half-cent boundary — ~1% of groups at 100-row group sizes (measured on
    tpch_q7: 4 of 600 groups). Summing in DECIMAL is exact and
    order-independent; the oracle SQL mirrors it with
    ``CAST(round(sum(CAST(x AS DECIMAL(18,4))), d) AS DOUBLE)``. The 18,4
    input widens automatically during aggregation in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(18,4)")), digits).cast("double")


def _davg(col, digits: int = 4):
    """Order-independent rounded mean: exact decimal sum, one double
    division (deterministic), then round. Mirrors
    ``round(CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / count(x), d)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast("decimal(18,4)")).cast("double") / F.count(c), digits
    )


def _ssum(col, digits: int = 2, scale: int = 10000):
    """Order-independent rounded sum at INT64 speed: the value is snapped to
    a 1/scale grid (exact for money/quantity columns with <= 4 decimal
    digits), summed as bigint (exact, order-independent, no decimal-kernel
    cost — decimal sums measured ~2x slower on the 8-agg flagship query),
    then divided back. int64 overflow bound: |sum(x)| * scale < 9.2e18 —
    fine to ~1e14 in column units; use _dsum where totals can exceed that.
    Mirrors ``round(sum(CAST(round(x * scale) AS BIGINT)) / (scale*1.0), d)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(F.round(c * scale).cast("long")) / F.lit(float(scale)), digits
    )


def _savg(col, digits: int = 4, scale: int = 10000):
    """Scaled-int mean, same exactness argument as :func:`_ssum`; the single
    double division is bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(F.round(c * scale).cast("long"))
        / (F.lit(float(scale)) * F.count(c)),
        digits,
    )


# =============================================================================
# Flagship + TPC-H-style headline queries (A2/A3 aggregation shapes)
# =============================================================================


@_q(
    "flagship_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(CAST(round(l_quantity * 10000) AS BIGINT)) / 10000.0, 2) AS sum_qty,
           round(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) / 10000.0, 2) AS sum_base_price,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
           round(sum(CAST(round(l_quantity * 10000) AS BIGINT)) / (10000.0 * count(l_quantity)), 4) AS avg_qty,
           round(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) / (10000.0 * count(l_extendedprice)), 4) AS avg_price,
           round(sum(CAST(round(l_discount * 10000) AS BIGINT)) / (10000.0 * count(l_discount)), 4) AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    doc="TPC-H Q1 shape: scan + filter + 8-way agg; map-side partial agg",
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _ssum("l_quantity").alias("sum_qty"),
            _ssum("l_extendedprice").alias("sum_base_price"),
            _ssum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            _savg("l_quantity").alias("avg_qty"),
            _savg("l_extendedprice").alias("avg_price"),
            _savg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    headline=True,
    doc="TPC-H Q3 shape: 3-way join + agg + total-order top-k",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    return sorts.top_n(
        agg, [F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")], 10
    ).select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")


@_q(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n_name, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    headline=True,
    doc="TPC-H Q5 shape: 6-way join, broadcast dims, one wide agg",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# =============================================================================
# Filters (F1-F5)
# =============================================================================


@_q(
    "f1_and_equality_filter",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
    """,
    doc="F1: AND-combined equality filters → single pushed-down scan filter",
)
def f1_and_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    out = filters.and_equals(
        orders, o_orderstatus="O", o_orderpriority="1-URGENT"
    )
    return out.select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


@_q(
    "f2_time_range",
    """
    SELECT l_returnflag, count(*) AS n, CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1999-06-01'
    GROUP BY l_returnflag
    """,
    doc="F2: range predicate on time, pushed to parquet row-group stats",
)
def f2_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = filters.since(
        _t(spark, sf_dir, "lineitem"),
        "l_shipdate",
        F.lit("1999-06-01").cast("timestamp"),
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), _dsum("l_quantity").alias("qty")
    )


@_q(
    "f4_prefix_filter",
    """
    SELECT event_id, event_type, round(value, 2) AS value
    FROM events
    WHERE event_type LIKE 'cl%' AND value > 100
    """,
    doc="F4: prefix + range filter on the event log",
)
def f4_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = filters.level_and_prefix(ev, "event_type", None, "event_type", "cl").filter(
        F.col("value") > 100
    )
    return out.select("event_id", "event_type", F.round("value", 2).alias("value"))


@_q(
    "f5_ci_prefix",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE lower(c_name) LIKE 'customer#00000001%'
    """,
    doc="F5: case-insensitive prefix filter (completion-style)",
)
def f5_ci_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return filters.ci_prefix(cust, "c_name", "Customer#00000001").select(
        "c_custkey", "c_name"
    )


# =============================================================================
# Aggregations (A1-A3)
# =============================================================================


@_q(
    "a1_group_count",
    """
    SELECT o_orderpriority AS key, count(*) AS n
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    doc="A1: filtered group-by count (unread-counts shape)",
)
def a1_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return aggregates.counts_per_key(orders, "o_orderpriority").withColumnRenamed(
        "o_orderpriority", "key"
    )


@_q(
    "a2_running_counters",
    """
    SELECT o_custkey, count(*) AS message_count,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS token_usage
    FROM orders GROUP BY o_custkey
    """,
    doc="A2: per-key count+sum (message_count/token_usage counters as a view)",
)
def a2_running_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    out = aggregates.running_counters(orders, "o_custkey", "o_totalprice")
    return out.select(
        "o_custkey", "message_count", F.round("token_usage", 2).alias("token_usage")
    )


@_q(
    "a3_metrics_argmax",
    """
    WITH agg AS (
      SELECT event_type, count(*) AS total,
             round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value), 4) AS avg_value,
             round(max(value), 4) AS max_value
      FROM events GROUP BY event_type
    ), ranked AS (
      SELECT event_type, event_id, row_number() OVER (
        PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT a.event_type, a.total, a.avg_value, a.max_value,
           r.event_id AS argmax_event_id
    FROM agg a JOIN ranked r ON a.event_type = r.event_type AND r.rn = 1
    """,
    doc="A3: count/avg/max/argmax with deterministic struct-max tiebreak",
)
def a3_metrics_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("total"),
        _davg("value").alias("avg_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.max(F.struct(F.col("value"), F.col("event_id"))).alias("__mx"),
    ).select(
        "event_type",
        "total",
        "avg_value",
        "max_value",
        F.col("__mx.event_id").alias("argmax_event_id"),
    )


# =============================================================================
# Joins (J1-J7) + recursion (J3)
# =============================================================================


@_q(
    "j1_semi_join_fetch",
    """
    SELECT l_returnflag, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderstatus = 'F' AND o_totalprice > 300000)
    GROUP BY l_returnflag
    """,
    doc="J1: index-filter-then-fetch as broadcast left-semi join",
)
def j1_semi_join_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    keys = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 300000)
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    fetched = joins.semi_fetch(li, keys, "l_orderkey")
    return fetched.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n"),
    )


@_q(
    "j2_parent_child_self_join",
    """
    SELECT c.c_custkey AS child_key, p.c_custkey AS parent_key, p.c_name AS parent_name
    FROM customer c JOIN customer p ON p.c_custkey = c.c_custkey // 2
    WHERE c.c_custkey < 60
    """,
    doc="J2: parent→child self-join over a synthetic key-halving hierarchy",
)
def j2_parent_child_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    child = cust.filter(F.col("c_custkey") < 60).select(
        F.col("c_custkey").alias("child_key"),
        F.floor(F.col("c_custkey") / 2).cast("long").alias("parent_key"),
    )
    parent = cust.select(
        F.col("c_custkey").alias("parent_key"), F.col("c_name").alias("parent_name")
    )
    return child.join(F.broadcast(parent), "parent_key").select(
        "child_key", "parent_key", "parent_name"
    )


@_q(
    "j3_recursive_descendants",
    """
    WITH RECURSIVE r(custkey, depth) AS (
      SELECT CAST(1 AS BIGINT), 0
      UNION ALL
      SELECT c.c_custkey, r.depth + 1
      FROM customer c JOIN r ON c.c_custkey // 2 = r.custkey
      WHERE r.depth < 4 AND c.c_custkey > 1
    )
    SELECT custkey, depth FROM r
    """,
    doc="J3: recursive hierarchy closure — iterative frontier join vs WITH RECURSIVE",
)
def j3_recursive_descendants(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    edges = cust.select(
        F.floor(F.col("c_custkey") / 2).cast("long").alias("parent"),
        F.col("c_custkey").alias("child"),
    ).filter(F.col("child") > 1)
    seeds = spark.createDataFrame([(1,)], "child long")
    out = closure.descendants(edges, seeds, "parent", "child", max_depth=4)
    return out.select(
        F.col("child").alias("custkey"), F.col("depth").cast("int").alias("depth")
    )


@_q(
    "j5_fk_lookup_chain",
    """
    SELECT r_name, n_name, count(*) AS n_cust, round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(c_acctbal), 4) AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    headline=True,
    doc="J5: FK lookup chain with broadcast dimensions",
)
def j5_fk_lookup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = joins.fk_lookup(cust, nation, "c_nationkey", "n_nationkey", "inner")
    j = joins.fk_lookup(j, region, "n_regionkey", "r_regionkey", "inner")
    return j.groupBy("r_name", "n_name").agg(
        F.count("*").alias("n_cust"), _davg("c_acctbal").alias("avg_bal")
    )


@_q(
    "j6_history_topk",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ORDER BY l_shipdate DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    doc="J6: 1:N history join, newest-first, total-order limit",
)
def j6_history_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = joins.history(
        orders.select("o_orderkey", "o_orderdate"),
        li.select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_shipdate"),
        "o_orderkey",
        "l_shipdate",
    )
    return sorts.top_n(
        j, [F.desc("l_shipdate"), F.asc("o_orderkey"), F.asc("l_linenumber")], 20
    ).select(
        F.col("o_orderkey").alias("l_orderkey"), "l_linenumber", "l_shipdate", "o_orderdate"
    )


@_q(
    "j7_union_resort",
    """
    SELECT event_type, count(*) AS n, min(ts) AS first_ts, max(ts) AS last_ts
    FROM (
      SELECT * FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT * FROM events WHERE event_type = 'error'
    )
    GROUP BY event_type
    """,
    doc="J7: union of two log slices + re-aggregation over global order",
)
def j7_union_resort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    merged = joins.union_resort(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
        "ts",
    )
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# =============================================================================
# Windows (W1-W3) & sessionization (S1, S3)
# =============================================================================


@_q(
    "w1_turn_numbering",
    """
    SELECT event_id, user_id,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS turn_id
    FROM events
    """,
    headline=True,
    doc="W1: marker running-count turn assignment",
)
def w1_turn_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = turn_number(
        ev, "user_id", [F.asc("ts"), F.asc("event_id")], F.col("event_type") == "signup"
    )
    return out.select("event_id", "user_id", "turn_id")


@_q(
    "w2_pre_post_pairing",
    """
    WITH c AS (
      SELECT user_id, event_id, ts, CAST(row_number() OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id, ts, CAST(row_number() OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.rn AS pair_rn, c.event_id AS pre_event_id,
           p.event_id AS post_event_id,
           date_diff('microsecond', c.ts, p.ts) AS gap_us
    FROM c JOIN p ON c.user_id = p.user_id AND c.rn = p.rn
    """,
    headline=True,
    doc="W2: i-th pre ↔ i-th post pairing (tool:pre/tool:post shape)",
)
def w2_pre_post_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select("user_id", "event_type", "event_id", "ts")
    paired = pair_tool_events(
        ev,
        keys=["user_id"],
        kind_col="event_type",
        order=[F.asc("ts"), F.asc("event_id")],
        pre_kind="click",
        post_kind="purchase",
        rank_col="pair_rn",
    )
    return paired.filter(F.col("event_id_post").isNotNull()).select(
        "user_id",
        "pair_rn",
        F.col("event_id").alias("pre_event_id"),
        F.col("event_id_post").alias("post_event_id"),
        # exact integer microseconds: float seconds would round differently
        # across engines at the ms boundary
        (F.unix_micros(F.col("ts_post")) - F.unix_micros(F.col("ts"))).alias("gap_us"),
    )


@_q(
    "s1_sessionize_flat",
    """
    WITH numbered AS (
      SELECT user_id, ts, value,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS turn_id
      FROM events
    )
    SELECT user_id, turn_id, count(*) AS n_events,
           min(ts) AS turn_start, max(ts) AS turn_end,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS value_sum
    FROM numbered GROUP BY user_id, turn_id
    """,
    headline=True,
    doc="S1 (flattened): marker sessionization → per-turn stats",
)
def s1_sessionize_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return turn_stats(
        ev,
        "user_id",
        "ts",
        [F.asc("ts"), F.asc("event_id")],
        F.col("event_type") == "signup",
        "value",
    )


@_q(
    "s3_truncation",
    """
    SELECT doc_id,
           CAST(length(CASE WHEN length(text) > 100
                  THEN substr(text, 1, 100) || '... (truncated)'
                  ELSE text END) AS BIGINT) AS trunc_len,
           length(text) > 100 AS is_truncated
    FROM documents
    """,
    doc="S3: payload truncation with suffix",
)
def s3_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(truncate_payload("text", 100)).cast("long").alias("trunc_len"),
        (F.length("text") > 100).alias("is_truncated"),
    )


# =============================================================================
# Sorts / limits / pagination (O1-O4)
# =============================================================================


@_q(
    "o1_top_n",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="O1: sort desc + limit → TakeOrderedAndProject",
)
def o1_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return sorts.top_n(
        orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], 10
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


@_q(
    "o2_offset_page",
    """
    SELECT event_id, user_id FROM events
    ORDER BY ts, event_id LIMIT 50 OFFSET 100
    """,
    doc="O2/O3: offset/limit pagination over a total order",
)
def o2_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return sorts.page(ev, [F.asc("ts"), F.asc("event_id")], 100, 50).select(
        "event_id", "user_id"
    )


@_q(
    "o4_tail_per_group",
    """
    SELECT user_id, event_id FROM (
      SELECT user_id, event_id, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t WHERE rn <= 2
    """,
    doc="O4: tail-N per group (last N transcript messages shape)",
)
def o4_tail_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return sorts.tail_n(
        ev, "user_id", [F.desc("ts"), F.desc("event_id")], 2
    ).select("user_id", "event_id")


# =============================================================================
# Scalar functions (T-series)
# =============================================================================


@_q(
    "t1_mention_tokens",
    r"""
    SELECT tok, count(*) AS n FROM (
      SELECT unnest(regexp_extract_all(lower(text), '\b(s[a-z]+)\b', 1)) AS tok
      FROM documents)
    GROUP BY tok
    """,
    doc="T1 machinery: regexp_extract_all + explode + count (mention-style)",
)
def t1_mention_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\b(s[a-z]+)\b"), 1)
        ).alias("tok")
    )
    return toks.groupBy("tok").agg(F.count("*").alias("n"))


@_q(
    "t4_sha256",
    """
    SELECT doc_id, sha256(text) AS digest FROM documents
    """,
    doc="T4: SHA-256 content identity",
)
def t4_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2("text", 256).alias("digest"))


@_q(
    "t7_month_format",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
    FROM orders GROUP BY month
    """,
    doc="T7: timestamp parse/format",
)
def t7_month_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n"))


@_q(
    "t8_date_arithmetic",
    """
    SELECT o_orderstatus, count(*) AS n
    FROM orders
    WHERE o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 90 DAY FROM orders)
    GROUP BY o_orderstatus
    """,
    doc="T8: date arithmetic against a scalar aggregate",
)
def t8_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Uncorrelated scalar subquery, executed the way Catalyst itself would:
    # the 1-value aggregate runs as its own (stats-fast) job, and the result
    # becomes a LITERAL predicate on the main scan — so the date filter
    # reaches PushedFilters instead of sitting above a 1-row
    # BroadcastNestedLoopJoin (the previous shape, flagged by the catalog
    # plan lint).
    orders = _t(spark, sf_dir, "orders")
    cutoff = orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAY")).alias("c")
    ).collect()[0]["c"]
    return (
        orders.filter(F.col("o_orderdate") >= F.lit(cutoff))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@_q(
    "t17_json_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="T17/T14: JSON string field extraction + aggregation",
)
def t17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("k_sum"),
        F.count("*").alias("n"),
    )


# =============================================================================
# Dedup (D1-D2 + near-dup family)
# =============================================================================


@_q(
    "d1_exact_dedup",
    """
    SELECT sha256(text) AS content_sha256, count(*) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents GROUP BY sha256(text)
    """,
    doc="D1: content dedup by SHA-256 hash-groupBy",
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = dedup.exact(docs, "text", "doc_id")
    return out.select(
        "content_sha256",
        "n_copies",
        F.array_min("doc_ids").alias("first_doc"),
    )


@_q(
    "d2_first_wins",
    """
    SELECT user_id, event_type, event_id FROM (
      SELECT user_id, event_type, event_id, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      FROM events) t WHERE rn = 1
    """,
    doc="D2: order-preserving first-wins dedup (explicit encounter order)",
)
def d2_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return dedup.first_wins(ev, ["user_id", "event_type"], "event_id").select(
        "user_id", "event_type", "event_id"
    )


def _hash64_sql(expr: str, seed: int = 0) -> str:
    inner = f"concat('s{seed}:', {expr})" if seed else expr
    return f"CAST('0x' || substr(md5({inner}), 1, 15) AS BIGINT)"


def _minhash_oracle(k: int = 16, bands: int = 4, min_j: float = 0.5) -> str:
    from lakehouse_spark.operators.dedup import xor_salts

    rows = k // bands
    sig_exprs = ",\n             ".join(
        f"list_min(list_transform(hs, h -> xor(h, {salt}))) AS m{j}"
        for j, salt in enumerate(xor_salts(k))
    )
    band_rows = ", ".join(
        "({b}, [{ms}])".format(
            b=b, ms=", ".join(f"m{b * rows + i}" for i in range(rows))
        )
        for b in range(bands)
    )
    return f"""
    WITH words AS (
      SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
      FROM words WHERE len(w) >= 3
    ), sig AS (
      SELECT id, sh,
             {sig_exprs}
      FROM (SELECT id, sh,
                   list_transform(sh, s -> {_hash64_sql('s')}) AS hs
            FROM base)
    ), banded AS (
      SELECT id, b.band, b.band_sig
      FROM sig, LATERAL (VALUES {band_rows}) AS b(band, band_sig)
    ), pairs AS (
      SELECT DISTINCT a.id AS a_id, b.id AS b_id
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
    )
    SELECT a_id, b_id, jaccard FROM (
      SELECT p.a_id, p.b_id,
             round(len(list_intersect(x.sh, y.sh)) * 1.0 /
                   len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
      FROM pairs p
      JOIN base x ON x.id = p.a_id
      JOIN base y ON y.id = p.b_id) v
    WHERE jaccard >= {min_j}
    """


@_q(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    headline=True,
    doc="MinHash+LSH near-dup: shingle→sign→band→bucket-join→verify",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, k=16, bands=4, min_jaccard=0.0
    )
    return pairs.withColumn("jaccard", F.round("jaccard", 4)).filter(
        F.col("jaccard") >= 0.5
    )


def _simhash_oracle(bits: int = 60) -> str:
    votes = ",\n             ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id AS id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ), h AS (
      SELECT id, {_hash64_sql('tok')} AS h FROM tok
    ), votes AS (
      SELECT id, {votes}
      FROM h GROUP BY id
    )
    SELECT id AS doc_id, CAST({fingerprint} AS BIGINT) AS simhash FROM votes
    """


@_q(
    "dedup_simhash",
    _simhash_oracle(),
    doc="SimHash 60-bit fingerprints: explode + 60 static bit-vote aggregates",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text").withColumnRenamed("id", "doc_id")


@_q(
    "dedup_ngram_jaccard",
    """
    WITH words AS (
      SELECT doc_id AS id,
             lang || '|' || source || '|' ||
               CAST(CAST(floor(log2(len(regexp_split_to_array(trim(text), '\\s+'))))
                    AS BIGINT) AS VARCHAR) AS blk,
             regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT id, blk,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
      FROM words WHERE len(w) >= 3
    )
    SELECT a_id, b_id, jaccard FROM (
      SELECT a.id AS a_id, b.id AS b_id,
             round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                   len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
      FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id) v
    WHERE jaccard >= 0.1
    """,
    doc="Exact n-gram Jaccard within (lang, source, log2-length) blocks",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block key includes a log2 word-count bucket: the O(block²) pair join
    is bounded by the largest (lang, source, length-bucket) cell, so one
    giant (en, web) slice can no longer go quadratic at scale. Trade-off
    (documented): cross-bucket pairs are unseen — acceptable because this
    operator is the exact VERIFIER; candidate recall belongs to MinHash/
    SimHash upstream. Same blocking on the oracle side, so the comparison
    stays exact."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "blk",
        F.concat_ws(
            "|",
            "lang",
            "source",
            F.floor(
                F.log2(F.size(F.split(F.trim("text"), r"\s+")))
            ).cast("long").cast("string"),
        ),
    )
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", "blk", n=3, min_jaccard=0.0
    )
    return pairs.withColumn("jaccard", F.round("jaccard", 4)).filter(
        F.col("jaccard") >= 0.1
    )


@_q(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a_id, b_id, cosine FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                   6) AS cosine
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id) v
    WHERE cosine >= 0.3
    """,
    doc="Embedding-cosine near-dup within label blocks (JVM vector math)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    pairs = dedup.embedding_near_duplicates(
        emb, "vec_id", "embedding", block_col="label", min_cosine=-1.0
    )
    return pairs.withColumn("cosine", F.round("cosine", 6)).filter(
        F.col("cosine") >= 0.3
    )


# =============================================================================
# Similarity search
# =============================================================================


@_q(
    "sim_topk_bruteforce",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
               FROM embeddings)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                   6) AS cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
               neighbor_id) AS INTEGER) AS rank
      FROM q JOIN c ON neighbor_id <> query_id) t
    WHERE rank <= 5
    """,
    headline=True,
    doc="Exact cosine top-k ANN baseline (broadcast queries, no corpus shuffle)",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return similarity.cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    )


@_q(
    "sim_ivf_topk",
    None,  # approximate by design: recall < 1 vs brute force → rows-only check
    doc="IVF-bucketed approximate top-k (probe nprobe nearest centroids)",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end learned-index path: centroids come from the DataFrame-
    native k-means (Lloyd iterations, corpus never shuffles), not a modulo
    sample — so the catalog exercises build + assign + probe together.
    Recall@k vs sim_topk_bruteforce is reported by bench.py."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    centroids = similarity.kmeans_centroids(emb, n_clusters=64, iters=3)
    bucketed = similarity.assign_buckets(emb, centroids, spill=2)
    # The testdata embeddings are near-random — the hardest case for IVF
    # (no real cluster structure to exploit). spill=2 assignment (each vector
    # indexed under its top-2 buckets) + nprobe=16 of 64 scans ~40% of the
    # corpus per query for recall@5 ≈ 0.9+ at sf0.1 (vs 0.64 with
    # single-assignment nprobe=12/50 in round 2). Clustered real embeddings
    # buy far higher recall at a much smaller probe fraction.
    return similarity.ivf_topk(
        bucketed, centroids, emb.filter(F.col("vec_id") < 10), k=5, nprobe=16
    )


# =============================================================================
# Text analysis
# =============================================================================

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in text._STOPWORDS) + "]"


@_q(
    "text_quality",
    f"""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS n_chars_raw,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words_raw,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 w -> list_contains({_STOP_SQL}, lower(w)))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars_raw AS BIGINT) AS n_chars,
           CAST(n_words_raw AS BIGINT) AS n_words,
           round((n_chars_raw - (n_words_raw - 1)) * 1.0 / n_words_raw, 4) AS mean_word_len,
           round(n_punct * 1.0 / greatest(n_chars_raw, 1), 4) AS punct_ratio,
           round(n_stop * 1.0 / greatest(n_words_raw, 1), 4) AS stopword_ratio,
           round(n_upper * 1.0 / greatest(n_chars_raw, 1), 4) AS upper_ratio,
           round(CAST((CASE WHEN n_words_raw >= 5 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN n_stop * 1.0 / greatest(n_words_raw, 1) BETWEEN 0.05 AND 0.6 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN n_punct * 1.0 / greatest(n_chars_raw, 1) < 0.2 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN (n_chars_raw - (n_words_raw - 1)) * 1.0 / n_words_raw BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
               AS DOUBLE), 2) AS quality_score
    FROM feats
    """,
    doc="Quality features + composite score (C4/Gopher-style heuristics)",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.quality_score(docs, "text").select(
        "doc_id",
        "n_chars",
        "n_words",
        "mean_word_len",
        "punct_ratio",
        "stopword_ratio",
        "upper_ratio",
        "quality_score",
    )


def _langid_ratio_sql() -> str:
    """Per-language marker hit-rate columns over the word array `w`."""
    ratios = []
    for lang in text._MARKER_LANGS:
        markers = "[" + ", ".join(f"'{w}'" for w in text._LANG_MARKERS[lang]) + "]"
        ratios.append(
            f"len(list_filter(w, x -> list_contains({markers}, x))) * 1.0 /"
            f" greatest(len(w), 1) AS r_{lang}"
        )
    return ",\n             ".join(ratios)


def _langid_case_sql() -> str:
    """The lang_guess CASE over script regexes + r_<lang> ratio columns.
    Spark's struct-max tie-break picks the lexicographically LARGEST lang
    code among equal scores → the CASE chain tests in DESC-lex order."""
    langs = list(text._MARKER_LANGS)
    g = "greatest(" + ", ".join(f"r_{l}" for l in langs) + ")"
    tie_chain = "\n                       ".join(
        f"WHEN r_{l} = {g} THEN '{l}'"
        for l in sorted(langs, reverse=True)[:-1]
    )
    script_chain = "\n                ".join(
        f"WHEN len(regexp_extract_all(text, '{pat}')) > 0 THEN '{lang}'"
        for lang, pat in text._SCRIPT_LANGS
    )
    last = sorted(langs)[0]
    return f"""CASE {script_chain}
                WHEN {g} > 0 THEN
                  CASE {tie_chain}
                       ELSE '{last}' END
                ELSE 'und' END"""


def _langid_oracle() -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, text,
             list_transform(regexp_split_to_array(trim(text), '\\s+'),
                            x -> lower(x)) AS w
      FROM documents
    ), scored AS (
      SELECT doc_id, text,
             {_langid_ratio_sql()}
      FROM words
    )
    SELECT doc_id,
           {_langid_case_sql()} AS lang_guess
    FROM scored
    """


@_q(
    "text_langid",
    _langid_oracle(),
    doc="Heuristic language ID: marker-word hit rate + CJK script detection",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.lang_id("text").alias("lang_guess"))


@_q(
    "text_tokens",
    r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
    doc="Token counting: whitespace + BPE-ish regex pre-tokenization",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.whitespace_token_count("text").cast("long").alias("ws_tokens"),
        text.bpe_ish_token_count("text").cast("long").alias("bpe_ish_tokens"),
    )


@_q(
    "text_fingerprint",
    r"""
    SELECT doc_id,
           sha256(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                      '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    doc="Normalization-stable document fingerprint (lower/strip/collapse + SHA-256)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint("text").alias("fp"))


# =============================================================================
# Coverage widening: part-table join, collect/duplicate aggs, union-dedup,
# heterogeneous sort, ancestor inheritance, lag/lead gaps, distinct counts
# =============================================================================


@_q(
    "tpch_q14_promo_revenue",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1999-01-01'
      AND l_shipdate <  TIMESTAMP '2000-01-01'
    """,
    headline=True,
    doc="TPC-H Q14 shape: fact→dim join (broadcast part) + conditional agg. "
    "Both sums are DECIMAL (order-independent); the ratio is one double "
    "division — identical op sequence on both engines",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@_q(
    "a5_collect_per_group",
    """
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_ids,
           count(*) AS n
    FROM events WHERE value > 450 GROUP BY event_type
    """,
    doc="A5: collect_list per group, sorted for determinism (paths-per-hash "
    "shape). Output is a ','-joined string, not ARRAY: the driver's "
    "canonicalizer sorts result columns with pandas, and raw list cells throw "
    "`unhashable type: 'list'` there (round-2 verdict).",
)
def a5_collect_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 450)
    # Sort numerically FIRST (matches DuckDB's list_sort on BIGINT), then cast
    # to string for array_join — joining string-sorted ids would disagree.
    ids = F.transform(
        F.array_sort(F.collect_set("user_id")), lambda x: x.cast("string")
    )
    return ev.groupBy("event_type").agg(
        F.array_join(ids, ",").alias("user_ids"),
        F.count("*").alias("n"),
    )


@_q(
    "a6_duplicate_keys",
    """
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day, count(*) AS n
    FROM orders GROUP BY 1, 2 HAVING count(*) > 1
    """,
    doc="A6: uniqueness-violation detection (duplicate name per project shape)",
)
def a6_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import aggregates

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("order_day")
    )
    return aggregates.duplicate_keys(orders, "o_custkey", "order_day")


@_q(
    "o5_completion_sort",
    """
    SELECT c_custkey, c_name, c_mktsegment = 'BUILDING' AS is_building
    FROM customer
    ORDER BY is_building DESC, lower(c_name), c_custkey
    LIMIT 25
    """,
    doc="O5: multi-key heterogeneous sort (dirs-first completion shape)",
)
def o5_completion_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumn(
        "is_building", F.col("c_mktsegment") == "BUILDING"
    )
    return sorts.top_n(
        cust,
        [F.desc("is_building"), F.lower(F.col("c_name")), F.asc("c_custkey")],
        25,
    ).select("c_custkey", "c_name", "is_building")


@_q(
    "d3_union_dedup",
    """
    SELECT event_id, event_type FROM events WHERE value > 400
    UNION
    SELECT event_id, event_type FROM events WHERE event_type = 'error' AND value > 300
    """,
    doc="D3: union of overlapping log slices with distinct (UNION semantics)",
)
def d3_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 400).select("event_id", "event_type")
    b = ev.filter((F.col("event_type") == "error") & (F.col("value") > 300)).select(
        "event_id", "event_type"
    )
    return a.unionByName(b).dropDuplicates()


@_q(
    "j9_nearest_ancestor",
    """
    WITH nodes AS (
      SELECT 'seg/' || c_mktsegment || '/' || CAST(c_custkey AS VARCHAR) AS path
      FROM customer WHERE c_custkey <= 200
    ), dirs AS (
      SELECT DISTINCT 'seg/' || c_mktsegment AS dpath, lower(c_mktsegment) AS attr
      FROM customer
      UNION ALL SELECT 'seg', 'root'
    ), hits AS (
      SELECT n.path, d.attr, length(d.dpath) AS l
      FROM nodes n JOIN dirs d
        ON n.path = d.dpath OR starts_with(n.path, d.dpath || '/')
    )
    SELECT path, max_by(attr, l) AS inherited_default_profile
    FROM hits GROUP BY path
    """,
    doc="J9: nearest-ancestor attribute inheritance (longest path-prefix match)",
)
def j9_nearest_ancestor(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nodes = cust.filter(F.col("c_custkey") <= 200).select(
        F.concat(
            F.lit("seg/"), F.col("c_mktsegment"), F.lit("/"), F.col("c_custkey")
        ).alias("path")
    )
    dirs = (
        cust.select(
            F.concat(F.lit("seg/"), F.col("c_mktsegment")).alias("path"),
            F.lower(F.col("c_mktsegment")).alias("default_profile"),
        )
        .distinct()
        .unionByName(
            spark.createDataFrame([("seg", "root")], "path string, default_profile string")
        )
    )
    return closure.nearest_ancestor_attr(nodes, dirs, "path", "default_profile")


@_q(
    "w3_lag_gaps",
    """
    SELECT user_id,
           count(*) AS n_gaps,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM (
      SELECT user_id,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events)
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="W3/lag: event-gap analysis via lag window over per-user time order",
)
def w3_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "gap_us", F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"), F.max("gap_us").alias("max_gap_us")
    )


@_q(
    "skew_salted_agg",
    """
    SELECT l_returnflag AS key,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty,
           count(*) AS n,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Salted two-phase aggregation — must equal the direct group-by exactly",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import skew

    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_returnflag", "key")
    out = skew.salted_agg(
        li,
        ["key"],
        {
            "qty": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "max_price": ("l_extendedprice", "max"),
        },
        n_salts=8,
    )
    return out.select(
        "key",
        F.round("qty", 2).alias("qty"),
        "n",
        F.round("max_price", 2).alias("max_price"),
    )


@_q(
    "agg_distinct_count",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Engine addition: exact distinct counts (expand + two-phase agg)",
)
def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@_q(
    "rollup_time_buckets",
    """
    SELECT time_bucket(INTERVAL 1 DAY, ts) AS bucket_start, event_type,
           count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """,
    headline=True,
    doc="Tumbling time-bucket rollup — same expression serves streaming views",
)
def rollup_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import rollup

    ev = _t(spark, sf_dir, "events")
    return rollup.time_bucket_rollup(
        ev,
        "ts",
        "1 day",
        ["event_type"],
        [F.count("*").alias("n"), _dsum("value").alias("value_sum")],
    ).select("bucket_start", "event_type", "n", "value_sum")


@_q(
    "rollup_hierarchy",
    """
    SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
           count(*) AS n, CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP subtotals: one expand+shuffle instead of per-level re-aggregation",
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import rollup as ru

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    out = ru.hierarchy_rollup(
        j,
        ["r_name", "n_name"],
        [F.count("*").alias("n"), _dsum("c_acctbal").alias("bal")],
    )
    # Subtotal NULL labels -> 'ALL': value canonicalizers that sort rows
    # with pandas throw on mixed None/str cells (the a5 lesson); the data
    # has no NULL names, so the sentinel is unambiguous.
    return out.select(
        F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
        F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
        "n",
        "bal",
    )


@_q(
    "t9_interval_parse",
    """
    SELECT v, coalesce(CAST(CASE regexp_extract(v, '^(\\d+)([smhd])$', 2)
             WHEN 's' THEN 1 WHEN 'm' THEN 60 WHEN 'h' THEN 3600
             WHEN 'd' THEN 86400 END
           * try_cast(regexp_extract(v, '^(\\d+)([smhd])$', 1) AS BIGINT)
           AS BIGINT), -1) AS seconds
    FROM (VALUES ('30s'), ('5m'), ('2h'), ('1d'), ('90m'), ('oops'), ('7w'))
         AS t(v)
    """,
    doc="T9: interval-string grammar parse; malformed -> -1 in the catalog "
    "output (the operator itself yields NULL; the sentinel keeps the "
    "bigint column canonicalizer-sortable)",
)
def t9_interval_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.functions.scalar import interval_to_seconds

    df = spark.createDataFrame(
        [("30s",), ("5m",), ("2h",), ("1d",), ("90m",), ("oops",), ("7w",)],
        "v string",
    )
    return df.select(
        "v", F.coalesce(interval_to_seconds("v"), F.lit(-1)).alias("seconds")
    )


@_q(
    "f3_boolean_flag",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE (o_orderpriority = '1-URGENT') = true AND o_orderstatus = 'F'
    """,
    doc="F3: boolean-flag filter (unread/enabled shape)",
)
def f3_boolean_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn(
        "__urgent", F.col("o_orderpriority") == "1-URGENT"
    )
    return filters.flag(
        orders.filter(F.col("o_orderstatus") == "F"), "__urgent"
    ).select("o_orderkey", "o_orderpriority")


@_q(
    "a4_page_envelope",
    """
    SELECT count(*) AS total, count(*) > 120 AS has_more
    FROM events WHERE event_type = 'click' AND value > 50
    """,
    doc="A4: pagination envelope (total + has_more) in one aggregate",
)
def a4_page_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "click") & (F.col("value") > 50)
    )
    return ev.agg(
        F.count("*").alias("total"), (F.count("*") > 120).alias("has_more")
    )


# =============================================================================
# Multimodal plumbing (documents stand in for binary assets: payload =
# utf-8 bytes of text, duration derived from n_chars — deterministic)
# =============================================================================


def _doc_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("asset_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("audio/wav").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") / 100.0).alias("duration_s"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


@_q(
    "mm_frame_sample_plan",
    """
    SELECT 'doc-' || doc_id AS asset_id,
           CAST(i AS INTEGER) AS frame_idx,
           round(i * 2.0, 3) AS frame_ts
    FROM (
      SELECT doc_id,
             unnest(range(0,
               CAST(greatest(floor((n_chars / 100.0) / 2.0), 1) AS BIGINT))) AS i
      FROM documents)
    """,
    doc="Multimodal: video frame-sampling plan (explode vs generate_series)",
)
def mm_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import multimodal

    assets = _doc_assets(spark, sf_dir)
    return multimodal.frame_sample_plan(assets, every_s=2.0).select(
        "asset_id", "frame_idx", F.round("frame_ts", 3).alias("frame_ts")
    )


@_q(
    "mm_resize_plan",
    """
    SELECT 'doc-' || doc_id AS asset_id, w AS width, h AS height,
           CAST(ceil(w * least(512.0 / greatest(w, h), 1.0)) AS INTEGER) AS target_width,
           CAST(ceil(h * least(512.0 / greatest(w, h), 1.0)) AS INTEGER) AS target_height
    FROM (SELECT doc_id,
                 CAST(200 + (doc_id * 37) % 1800 AS INTEGER) AS w,
                 CAST(200 + (doc_id * 53) % 1200 AS INTEGER) AS h
          FROM documents)
    """,
    doc="Multimodal: aspect-preserving resize plan (pure column math)",
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    assets = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("asset_id"),
        (200 + (F.col("doc_id") * 37) % 1800).cast("int").alias("width"),
        (200 + (F.col("doc_id") * 53) % 1200).cast("int").alias("height"),
    )
    return multimodal.resize_plan(assets, max_side=512).select(
        "asset_id", "width", "height", "target_width", "target_height"
    )


@_q(
    "mm_feature_extract",
    """
    SELECT 'doc-' || doc_id AS asset_id,
           CAST(strlen(text) AS INT) AS byte_len,
           round(CAST(len(list_filter(string_split(text, ''),
                                      c -> ascii(c) // 32 = 0)) AS DOUBLE)
                 / greatest(strlen(text), 1), 6) AS f0,
           round(CAST(len(list_filter(string_split(text, ''),
                                      c -> ascii(c) // 32 = 3)) AS DOUBLE)
                 / greatest(strlen(text), 1), 6) AS f3,
           '' AS decode_error
    FROM documents
    """,
    doc="Multimodal: Arrow-batched decode/feature extraction. The fake "
    "decoder's byte-histogram IS SQL-expressible because the synthesized "
    "payloads are utf-8 of pure-ASCII text (verified at every SF: strlen == "
    "length), so byte buckets == codepoint//32 — upgrading this entry from "
    "rows-only to a full value-hash oracle over the mapInPandas path",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import multimodal

    assets = _doc_assets(spark, sf_dir)
    feats = multimodal.extract_features(assets, decoder=multimodal.fake_decoder)
    return feats.select(
        "asset_id",
        "byte_len",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 4), 6).alias("f3"),
        # '' instead of NULL: all-None object columns break pandas-sorting
        # canonicalizers (the a5 lesson)
        F.coalesce("decode_error", F.lit("")).alias("decode_error"),
    )


# =============================================================================
# Source/sink roundtrip + remaining scalar/filter inventory (SC1/SC4, F7,
# F8, S4, T2)
# =============================================================================


@_q(
    "sc1_jsonl_roundtrip",
    """
    SELECT event_type, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
    FROM events GROUP BY event_type
    """,
    doc="SC1+SC4: JSONL append sink + malformed-skipping line scan roundtrip",
)
def sc1_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SC1/SC4 ← trace_aggregator.py:82-97 + manager.py:282-283 semantics
    (read, not copied): rows appended as JSONL lines must scan back exactly,
    with blank/malformed lines skipped. The aggregate over the roundtripped
    log must equal the oracle's aggregate over the original table."""
    import os
    import re

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from lakehouse_spark.sources import jsonl as jsonl_src

    tag = re.sub(r"[^0-9A-Za-z.]+", "_", sf_dir.rstrip("/"))
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".scratch", f"sc1_{tag}"
    )
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    ev.write.mode("overwrite").json(out)  # SC4: one JSON object per line
    with open(os.path.join(out, "part-zz-malformed.json"), "w") as f:
        f.write('{"event_id": nope}\n\n   \n{"truncated": \n')
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("user_id", LongType()),
        ]
    )
    back = jsonl_src.read_jsonl(spark, out, schema)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("event_id").alias("sum_id")
    )


@_q(
    "f7_status_filter",
    """
    SELECT event_id, user_id, round(value, 4) AS value
    FROM events
    WHERE event_type = 'error'
    ORDER BY ts DESC, event_id DESC
    LIMIT 50
    """,
    doc="F7: status-equality filter, newest-first page (failed-executions shape)",
)
def f7_status_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(50)
        .select("event_id", "user_id", F.round("value", 4).alias("value"))
    )


@_q(
    "f8_projection",
    """
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    ORDER BY o_orderdate, o_orderkey
    LIMIT 100
    """,
    doc="F8: covering projection (2 of 9 cols) — pruning must reach the scan",
)
def f8_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
    )


@_q(
    "s4_iso_millis",
    """
    SELECT event_type,
           CAST(sum(ms) AS BIGINT) AS sum_ms,
           CAST(sum(CASE WHEN ms = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unparseable
    FROM (
      SELECT event_type,
             coalesce(epoch_ms(try_cast(
               CASE WHEN event_id % 97 = 0 THEN 'not-a-time'
                    ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END AS TIMESTAMP)), 0) AS ms
      FROM events)
    GROUP BY event_type
    """,
    doc="S4: ISO-8601 parse to epoch millis, unparseable → 0 (reference fallback)",
)
def s4_iso_millis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.functions.scalar import iso_to_millis

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("event_id") % 97 == 0, F.lit("not-a-time"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"))
        .alias("iso"),
    )
    return (
        ev.withColumn("ms", iso_to_millis("iso"))
        .groupBy("event_type")
        .agg(
            F.sum("ms").alias("sum_ms"),
            F.sum(F.when(F.col("ms") == 0, 1).otherwise(0)).alias("n_unparseable"),
        )
    )


@_q(
    "t2_mention_normalize",
    r"""
    SELECT regexp_replace(regexp_replace(raw, '^@', ''), '^"(.*)"$', '\1')
             AS target,
           count(*) AS n
    FROM (
      SELECT CASE doc_id % 3
               WHEN 0 THEN '@' || source
               WHEN 1 THEN '@"' || source || ' notes"'
               ELSE source END AS raw
      FROM documents)
    GROUP BY 1
    """,
    doc="T2: mention normalization (strip @, strip surrounding quotes)",
)
def t2_mention_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.functions.scalar import normalize_mention

    docs = _t(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("@"), F.col("source")))
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit('@"'), F.col("source"), F.lit(' notes"')),
        )
        .otherwise(F.col("source"))
        .alias("raw")
    )
    return (
        docs.select(normalize_mention("raw").alias("target"))
        .groupBy("target")
        .agg(F.count("*").alias("n"))
    )


# =============================================================================
# Non-SQL-expressible (rows-only checks)
# =============================================================================


@_q(
    "t12_id_generation",
    None,  # uuid() is nondeterministic by design — excluded from value hashing
    doc="T12: uuid-derived short ids + W3C-trace-style child span ids",
)
def t12_id_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.functions.scalar import child_span_id, short_id

    base = (
        _t(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(100)
        .select(F.col("o_orderkey").cast("string").alias("parent"))
    )
    return base.select(
        "parent",
        short_id().alias("session_id"),
        child_span_id(F.col("parent"), short_id(), F.lit("researcher")).alias(
            "child_id"
        ),
    )


@_q(
    "trace_turn_counts",
    None,  # applyInPandas marker fold over synthesized trace events
    doc="S1 exact fold: driver events re-shaped into trace events → nested turns",
)
def trace_turn_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshape the driver's generic events into TRACE_EVENT form (signup→
    prompt:submit, click→tool:pre, purchase→tool:post, view→thinking:delta,
    error→session:end) and run the full stateful fold."""
    from lakehouse_spark.operators.sessionize import aggregate_trace

    ev = _t(spark, sf_dir, "events")
    mapped = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("session_id"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
        F.lit("INFO").alias("lvl"),
        F.when(F.col("event_type") == "signup", "prompt:submit")
        .when(F.col("event_type") == "click", "tool:pre")
        .when(F.col("event_type") == "purchase", "tool:post")
        .when(F.col("event_type") == "view", "thinking:delta")
        .otherwise("session:end")
        .alias("event"),
        F.struct(
            F.lit("go").alias("prompt"),
            F.lit("tool").alias("tool_name"),
            F.create_map(F.lit("k"), F.col("props")).alias("tool_input"),
            F.lit("g0").alias("parallel_group_id"),
            F.lit("d").alias("delta"),
            F.struct(
                F.lit(True).alias("success"),
                F.lit("done").alias("output"),
                F.struct(F.lit(None).cast("string").alias("message")).alias("error"),
            ).alias("result"),
        ).alias("data"),
        F.col("event_id").alias("encounter_seq"),
    )
    turns = aggregate_trace(mapped)
    return turns.select(
        "session_id",
        "turn_id",
        "status",
        F.size("tools").alias("n_tools"),
        F.size("thinking").alias("n_thinking"),
    )


@_q(
    "cron_next_fire",
    None,  # needs a cron evaluator; no SQL equivalent
    doc="T10/CR2: vectorized cron/interval/once next-fire computation",
)
def cron_next_fire(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime, timezone

    from lakehouse_spark.functions.cron import next_execution_udf

    rows = [
        ("a1", "cron", "0 9 * * *"),
        ("a2", "cron", "*/30 * * * *"),
        ("a3", "cron", "0 0 1 * *"),
        ("a4", "interval", "30m"),
        ("a5", "interval", "2h"),
        ("a6", "once", "2030-06-01T12:00:00+00:00"),
        ("a7", "cron", "15 14 * * 1-5"),
        ("a8", "interval", "bogus"),
    ]
    df = spark.createDataFrame(rows, "id string, schedule_type string, schedule_value string")
    after = datetime(2026, 1, 15, 10, 30, tzinfo=timezone.utc)  # pinned clock
    udf = next_execution_udf(after)
    return df.withColumn(
        "next_execution", udf(F.col("schedule_type"), F.col("schedule_value"))
    )


@_q(
    "tpch_q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    headline=True,
    doc="TPC-H Q18 shape: high-cardinality agg → semi-join back into the "
    "fact → re-agg → total-order top-k; the semi side reuses the lineitem "
    "scan and AQE sizes its join strategy at runtime",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    j = (
        li.join(big.withColumnRenamed("l_orderkey", "__k"),
                F.col("l_orderkey") == F.col("__k"), "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    agg = j.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(_dsum("l_quantity").alias("total_qty"))
    return sorts.top_n(
        agg, [F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")], 100
    ).select(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate",
        F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
    )


# =============================================================================
# Inventory completion: O6/O7, T5/T14/T13/T3, S2, D4, F6
# =============================================================================


@_q(
    "o6_limit_pushdown",
    """
    SELECT event_id, user_id FROM events
    WHERE event_type = 'signup'
    LIMIT 50000
    """,
    doc="O6: limit pushed into the scan (LocalLimit early-exit); limit > "
    "matching rows so the result stays deterministic for hashing",
)
def o6_limit_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "signup")
        .select("event_id", "user_id")
        .limit(50000)
    )


@_q(
    "o7_global_sort",
    """
    SELECT event_id, event_type,
           CAST(row_number() OVER (ORDER BY ts, event_id) AS INTEGER) AS seq
    FROM (
      SELECT * FROM events WHERE event_type = 'signup' AND value > 200
      UNION ALL
      SELECT * FROM events WHERE event_type = 'error' AND value > 400
    )
    """,
    doc="O7: merged log slices under one global timestamp sort (range-"
    "partitioned total sort; the seq column makes the order hash-observable)",
)
def o7_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    merged = joins.union_resort(
        ev.filter((F.col("event_type") == "signup") & (F.col("value") > 200)),
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 400)),
        "ts",
    )
    # Order-observable seq WITHOUT a partition-less window over the data:
    # two-phase global index (distributed zipWithIndex in DataFrame form).
    # Phase 1: per-bucket counts (bucket = date(ts), a prefix of the sort
    # key) → cumulative offsets. The only partition-less window runs over
    # the BUCKET-COUNT table (#days rows), never the data. Phase 2: per-
    # bucket row_number + broadcast offset = the global rank. Survives any
    # scale-up: the data path is one partitioned window + broadcast join.
    bucket = F.to_date("ts")
    per_bucket = merged.groupBy(bucket.alias("__b")).agg(
        F.count("*").alias("__n")
    )
    w_off = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "__b", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = Window.partitionBy(bucket).orderBy("ts", "event_id")
    return (
        merged.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), bucket == F.col("__b"))
        .select(
            "event_id",
            "event_type",
            (F.col("__off") + F.col("__rn")).cast("int").alias("seq"),
        )
    )


@_q(
    "t5_case_functions",
    """
    SELECT upper(event_type) AS typ, count(*) AS n
    FROM events
    WHERE lower(event_type) LIKE 'c%'
    GROUP BY 1
    """,
    doc="T5: startswith/lower/upper normalization (level/prefix shape)",
)
def t5_case_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.lower(F.col("event_type")).startswith("c"))
        .groupBy(F.upper(F.col("event_type")).alias("typ"))
        .agg(F.count("*").alias("n"))
    )


@_q(
    "t14_nested_access",
    """
    SELECT event_type AS tool_name, value > 250 AS success,
           count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS output_sum
    FROM events GROUP BY 1, 2
    """,
    doc="T14: nested struct construction + dotted-path navigation "
    "(data.result.output shape); oracle computes the flat equivalent",
)
def t14_nested_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    nested = ev.select(
        F.struct(
            F.col("event_type").alias("tool_name"),
            F.struct(
                (F.col("value") > 250).alias("success"),
                F.col("value").alias("output"),
            ).alias("result"),
        ).alias("data")
    )
    return nested.groupBy(
        F.col("data.tool_name").alias("tool_name"),
        F.col("data.result.success").alias("success"),
    ).agg(
        F.count("*").alias("n"),
        _dsum(F.col("data.result.output")).alias("output_sum"),
    )


@_q(
    "s2_duration",
    """
    SELECT user_id,
           CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms,
           (epoch_ms(max(ts)) - epoch_ms(min(ts))) / 1000.0 AS duration_s
    FROM events GROUP BY user_id
    """,
    doc="S2: end-start duration (ms, and seconds via exact int/1000.0 division "
    "— round(x,2) flaps across engines at .xx5 halfway points)",
)
def s2_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.functions.scalar import duration_ms

    ev = _t(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.unix_millis(F.max("ts")).alias("__end"),
        F.unix_millis(F.min("ts")).alias("__start"),
    )
    return span.select(
        "user_id",
        duration_ms(F.col("__end"), F.col("__start"), 0)
        .cast("long")
        .alias("duration_ms"),
        ((F.col("__end") - F.col("__start")) / 1000.0).alias("duration_s"),
    )


@_q(
    "d4_visited_anti_join",
    """
    SELECT event_type, count(*) AS n
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM events x
                      WHERE x.user_id = e.user_id AND x.event_type = 'error')
    GROUP BY event_type
    """,
    doc="D4: visited-set anti-join (BFS building block) — events of users "
    "with no error event",
)
def d4_visited_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    visited = ev.filter(F.col("event_type") == "error").select("user_id")
    kept = dedup.visited_anti(ev, visited, "user_id")
    return kept.groupBy("event_type").agg(F.count("*").alias("n"))


@_q(
    "f6_hidden_exclusion",
    """
    SELECT name, count(*) AS n FROM (
      SELECT CASE WHEN doc_id % 5 = 0 THEN '.' || source ELSE source END AS name
      FROM documents)
    WHERE name NOT LIKE '.%'
    GROUP BY name
    """,
    doc="F6: hidden-name ('.'-prefix) exclusion (directory-listing shape)",
)
def f6_hidden_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.lit("."), F.col("source"))
        )
        .otherwise(F.col("source"))
        .alias("name")
    )
    return filters.not_hidden(docs, "name").groupBy("name").agg(
        F.count("*").alias("n")
    )


@_q(
    "t3_quote_decision",
    """
    SELECT mention, count(*) AS n FROM (
      SELECT CASE WHEN regexp_matches(p, '^[a-zA-Z0-9_\\-/\\.:]+$')
                  THEN '@' || p ELSE '@"' || p || '"' END AS mention
      FROM (SELECT CASE doc_id % 4
                     WHEN 0 THEN source || ' draft'
                     WHEN 1 THEN 'a b/' || source
                     WHEN 2 THEN 'lib/' || source
                     ELSE source END AS p
            FROM documents))
    GROUP BY mention
    """,
    doc="T3: mention quoting decision — quote iff path leaves the simple "
    "character class",
)
def t3_quote_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.functions.scalar import quote_mention

    docs = _t(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("source"), F.lit(" draft")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("a b/"), F.col("source")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("lib/"), F.col("source")))
        .otherwise(F.col("source"))
        .alias("p")
    )
    return (
        docs.select(quote_mention("p").alias("mention"))
        .groupBy("mention")
        .agg(F.count("*").alias("n"))
    )


@_q(
    "t13_path_functions",
    """
    SELECT DISTINCT
           'share/profiles/' || lang || '/' || source || '.yaml' AS path,
           'share/profiles/' || lang AS parent,
           source || '.yaml' AS leaf,
           source AS stem,
           CAST(4 AS INTEGER) AS depth
    FROM documents
    """,
    doc="T13: path functions — parent dir, last segment, suffix strip, depth",
)
def t13_path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.functions.scalar import (
        path_depth,
        path_last_segment,
        path_parent,
        strip_suffix,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("share/profiles/"), F.col("lang"), F.lit("/"), F.col("source"),
            F.lit(".yaml"),
        ).alias("path")
    )
    return docs.select(
        "path",
        path_parent("path").alias("parent"),
        path_last_segment("path").alias("leaf"),
        strip_suffix(path_last_segment("path"), ".yaml").alias("stem"),
        path_depth("path").cast("int").alias("depth"),
    ).distinct()


@_q(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left OUTER join keeping order-less customers + "
    "double aggregation (count per key, then distribution of counts)",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_q(
    "d5_except_intersect",
    """
    WITH hi AS (SELECT DISTINCT user_id FROM events WHERE value > 400),
         err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM hi EXCEPT SELECT * FROM err)
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS n
    FROM (SELECT * FROM hi INTERSECT SELECT * FROM err)
    """,
    doc="D5: EXCEPT/INTERSECT set ops (free-in-Spark additions per SURVEY §2.7)",
)
def d5_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hi = ev.filter(F.col("value") > 400).select("user_id").distinct()
    err = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    exc = hi.exceptAll(err).agg(
        F.lit("except").alias("op"), F.count("*").alias("n")
    )
    inter = hi.intersect(err).agg(
        F.lit("intersect").alias("op"), F.count("*").alias("n")
    )
    return exc.unionByName(inter)


@_q(
    "cr1_due_set",
    """
    WITH autos AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             o_orderkey % 3 <> 0 AS enabled,
             CAST(1 + o_orderkey % 120 AS VARCHAR) || 'm' AS schedule_value,
             CAST(o_orderdate AS TIMESTAMP)
               + to_seconds(60 * (1 + o_orderkey % 120)) AS next_execution
      FROM orders
    )
    SELECT id, schedule_value, next_execution FROM autos
    WHERE enabled AND next_execution IS NOT NULL
      AND next_execution <= TIMESTAMP '1995-06-15 01:00:00'
    """,
    doc="CR1: due-set scan over an automations-shaped table "
    "(interval schedules via the T9 grammar; pure pushed-down filter)",
)
def cr1_due_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an automations-shaped table from orders (deterministic
    interval schedules), compute next_execution with tz-free interval
    arithmetic, and run the CR1 due-set filter. Mirrors
    automation_scheduler.py:93-153's 'fire what has arrived' scan."""
    from datetime import datetime, timezone

    from lakehouse_spark.functions.scalar import interval_to_seconds
    from lakehouse_spark.mutation.automations import due_automations

    orders = _t(spark, sf_dir, "orders")
    autos = orders.select(
        F.col("o_orderkey").cast("string").alias("id"),
        (F.col("o_orderkey") % 3 != 0).alias("enabled"),
        F.concat(
            (F.lit(1) + F.col("o_orderkey") % 120).cast("string"), F.lit("m")
        ).alias("schedule_value"),
        F.col("o_orderdate").cast("timestamp").alias("created_at"),
    ).withColumn(
        "next_execution",
        F.col("created_at")
        + F.make_dt_interval(secs=interval_to_seconds("schedule_value")),
    )
    due = due_automations(
        autos, datetime(1995, 6, 15, 1, 0, tzinfo=timezone.utc)
    )
    return due.select("id", "schedule_value", "next_execution")


@_q(
    "f10_set_membership",
    """
    SELECT event_id, event_type FROM events
    WHERE event_type IN ('signup', 'error')
    """,
    doc="F10: set-membership filter (streamed-hook allowlist shape)",
)
def f10_set_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return filters.in_set(ev, "event_type", ("signup", "error")).select(
        "event_id", "event_type"
    )


@_q(
    "f11_safe_paths",
    """
    WITH paths AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 11 = 0 THEN '/' || source || '/' || CAST(doc_id AS VARCHAR)
               WHEN doc_id % 7 = 0 THEN '../' || source || '/' || CAST(doc_id AS VARCHAR)
               WHEN doc_id % 5 = 0 THEN source || '/../' || CAST(doc_id AS VARCHAR)
               WHEN doc_id % 3 = 0 THEN source || '\\' || CAST(doc_id AS VARCHAR)
               ELSE source || '/' || lang || '/' || CAST(doc_id AS VARCHAR) || '.txt'
             END AS path
      FROM documents
    )
    SELECT doc_id, path FROM paths
    WHERE length(path) > 0 AND path NOT LIKE '/%'
      AND NOT contains(path, '\\')
      AND NOT list_contains(string_split(path, '/'), '..')
    """,
    doc="F11: path-safety predicate over a synthesized path table "
    "(absolute / dot-dot / backslash escapes rejected in one scan)",
)
def f11_safe_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    paths = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.lit("/"), "source", F.lit("/"), did))
        .when(F.col("doc_id") % 7 == 0, F.concat(F.lit("../"), "source", F.lit("/"), did))
        .when(F.col("doc_id") % 5 == 0, F.concat("source", F.lit("/../"), did))
        .when(F.col("doc_id") % 3 == 0, F.concat("source", F.lit("\\"), did))
        .otherwise(
            F.concat("source", F.lit("/"), "lang", F.lit("/"), did, F.lit(".txt"))
        )
        .alias("path"),
    )
    return filters.only_safe_paths(paths, "path")


@_q(
    "t11_clock_conversion",
    """
    SELECT h24,
           CASE WHEN h24 % 12 = 0 THEN 12 ELSE h24 % 12 END AS hour12,
           CASE WHEN h24 < 12 THEN 'AM' ELSE 'PM' END AS meridiem,
           h24 AS h24_roundtrip, count(*) AS n
    FROM (SELECT CAST(hour(ts) AS INTEGER) AS h24 FROM events)
    GROUP BY 1, 2, 3, 4
    """,
    doc="T11: 24h -> (12h, AM/PM) -> 24h round-trip over event hours "
    "(midnight/noon edge cases exercised by the group-by)",
)
def t11_clock_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.functions.scalar import hour_12_to_24, hour_24_to_12

    ev = _t(spark, sf_dir, "events").select(
        F.hour("ts").cast("int").alias("h24")
    )
    conv = ev.withColumn("c", hour_24_to_12(F.col("h24")))
    return (
        conv.select(
            "h24",
            F.col("c.hour12").alias("hour12"),
            F.col("c.meridiem").alias("meridiem"),
            hour_12_to_24(F.col("c.hour12"), F.col("c.meridiem")).alias(
                "h24_roundtrip"
            ),
        )
        .groupBy("h24", "hour12", "meridiem", "h24_roundtrip")
        .agg(F.count("*").alias("n"))
    )


@_q(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-side conjunctive filter + one global agg "
    "(every predicate pushed to parquet; no join, no wide shuffle)",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: 3-way fact join + broadcast nation, grouped "
    "revenue, top-20 on a total order (TakeOrderedAndProject)",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_q(
    "tpch_q4_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (adapted: shipped-after-order as the EXISTS "
    "predicate since the trimmed schema has no commit/receipt dates): "
    "left-semi join + grouped count",
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


def _curation_oracle() -> str:
    qscore = """round(CAST((CASE WHEN n_words_raw >= 5 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN n_stop * 1.0 / greatest(n_words_raw, 1) BETWEEN 0.05 AND 0.6 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN n_punct * 1.0 / greatest(n_chars_raw, 1) < 0.2 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN (n_chars_raw - (n_words_raw - 1)) * 1.0 / n_words_raw BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
               AS DOUBLE), 2)"""
    return f"""
    WITH words AS (
      SELECT doc_id, text,
             list_transform(regexp_split_to_array(trim(text), '\\s+'),
                            x -> lower(x)) AS w,
             length(text) AS n_chars_raw,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words_raw,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> list_contains({_STOP_SQL}, lower(x)))) AS n_stop
      FROM documents
    ), scored AS (
      SELECT doc_id, text, n_words_raw,
             {qscore} AS quality_score,
             {_langid_ratio_sql()}
      FROM words
    ), judged AS (
      SELECT doc_id, n_words_raw, quality_score,
             {_langid_case_sql()} AS lang_guess,
             row_number() OVER (
               PARTITION BY sha256(trim(regexp_replace(
                 regexp_replace(lower(text), '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
      FROM scored
    )
    SELECT doc_id, lang_guess, quality_score,
           CASE WHEN n_words_raw < 5 THEN 'too_short'
                WHEN quality_score < 0.75 THEN 'low_quality'
                WHEN lang_guess <> 'en' THEN 'language'
                WHEN rn > 1 THEN 'duplicate'
                ELSE '' END AS reject_reason,
           (CASE WHEN n_words_raw < 5 THEN 'too_short'
                 WHEN quality_score < 0.75 THEN 'low_quality'
                 WHEN lang_guess <> 'en' THEN 'language'
                 WHEN rn > 1 THEN 'duplicate'
                 ELSE NULL END) IS NULL AS keep
    FROM judged
    """


@_q(
    "pipeline_curation",
    _curation_oracle(),
    doc="End-to-end curation funnel: quality -> langid -> fingerprint "
    "first-wins dedup -> keep/reject with precedence-ordered reasons "
    "(one scan + one fingerprint shuffle)",
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = text.curate_documents(
        docs, "doc_id", "text", min_words=5, min_quality=0.75,
        allowed_langs=("en",),
    )
    # Kept rows report '' instead of NULL: mixed None/str cells break
    # pandas-sorting canonicalizers (the a5 lesson). The operator itself
    # keeps the NULL-means-kept API.
    return out.withColumn(
        "reject_reason", F.coalesce("reject_reason", F.lit(""))
    )


@_q(
    "curation_stratified_sample",
    """
    SELECT lang, doc_id, sample_rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 25
    """,
    doc="Deterministic per-stratum downsample: smallest-md5(id) rows per "
    "lang — a reproducible, engine-agnostic training subsample (one shuffle "
    "on the stratum key + WindowGroupLimit top-n)",
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id")
    return text.stratified_sample(docs, "lang", "doc_id", n_per_stratum=25)


@_q(
    "doc_repetition_score",
    """
    SELECT doc_id,
           round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams),
                 6) AS rep3
    FROM (
      SELECT doc_id,
             list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
             ) AS grams
      FROM documents
    )
    WHERE len(grams) > 0
    """,
    doc="Intra-document repetition (Gopher-style filter signal): fraction of "
    "duplicated word 3-grams per doc — pure Catalyst, per-row, scan speed",
)
def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", text.repetition_score("text", n=3).alias("rep3"))
        .filter(F.col("rep3").isNotNull())
    )


@_q(
    "curation_decontaminate",
    """
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 4),
               i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')
             )) AS gram
      FROM documents),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 5),
    hits AS (SELECT DISTINCT doc_id FROM grams
             WHERE gram IN (SELECT gram FROM bench))
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
    headline=True,
    doc="Benchmark decontamination: flag docs sharing any word 5-gram with "
    "the benchmark set (docs 0-4) — broadcast semi join on grams; the "
    "corpus never shuffles",
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    return text.decontaminate(docs, bench, "doc_id", "text", n=5)


@_q(
    "tpch_q2_min_cost_part",
    """
    SELECT p_type, p_partkey, p_retailprice
    FROM part p
    WHERE p_retailprice = (
      SELECT min(p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
    )
    """,
    doc="TPC-H Q2 shape: correlated min subquery per group (cheapest part "
    "per type) — executed as a single partitioned window min, no self-join",
)
def tpch_q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("__min", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("__min"))
        .select("p_type", "p_partkey", "p_retailprice")
    )


@_q(
    "tpch_q12_priority_buckets",
    """
    SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_cnt
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape: CASE-bucketed counts over a fact-fact join "
    "(urgent vs other order priorities per ship month)",
)
def tpch_q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_cnt"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_cnt"),
        )
    )


@_q(
    "tpch_q16_supplier_cnt",
    """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (1, 5, 9, 13)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16 shape: NOT-IN exclusion (anti join on the tiny negative-"
    "balance supplier set) + count distinct per (brand, size)",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 5, 9, 13)
    ).select("p_partkey", "p_brand", "p_size")
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "tpch_q19_or_predicates",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity "
    "bands over a broadcast part join — exercises OR-tree predicate "
    "handling and partial pushdown",
)
def tpch_q19_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(band).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


@_q(
    "agg_rollup_revenue",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="Multi-level aggregation in one pass: ROLLUP(returnflag, linestatus) "
    "with grouping id — Spark's Expand + single shuffle vs re-scanning per "
    "level. NULL subtotal labels coalesced to 'ALL' (canonicalizer-safe; "
    "the data has no NULL flags, so it's unambiguous)",
)
def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "gid",
        )
    )


@_q(
    "agg_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` == "
    "DuckDB `quantile_cont`, linear interpolation). Exact form needs a "
    "per-group sort buffer — at 100 TB swap for approx_percentile "
    "(t-digest, mergeable partials); the exact form is the oracle anchor",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.expr(f"percentile(value, {q})"), 6).alias(name)
            for q, name in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90"))
        ]
    )


@_q(
    "emb_quantize_int8",
    """
    SELECT vec_id,
           array_to_string(
             list_transform(emb,
                            x -> CAST(floor(x * scale + 0.5) AS INT)),
             ',') AS qvec,
           round(scale, 6) AS scale_r,
           round(list_aggregate(
             list_transform(emb,
                            x -> abs(floor(x * scale + 0.5) / scale - x)),
             'sum') / len(emb), 9) AS mae
    FROM (
      SELECT vec_id, emb,
             CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale
      FROM (
        -- float32 -> double FIRST so both engines do all math in double
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
               list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE)))) AS amax
        FROM embeddings))
    """,
    doc="Symmetric per-vector int8 quantization (4x embedding storage shrink "
    "at 100 TB) + per-row mean-abs reconstruction error; floor(x+0.5) "
    "rounding so both engines emit identical codes",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q, scale, err = similarity.quantize_int8("embedding")
    return emb.select(
        "vec_id",
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias(
            "qvec"
        ),
        F.round(scale, 6).alias("scale_r"),
        F.round(err, 9).alias("mae"),
    )


@_q(
    "tpch_q7_nation_trade",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           -- sum in DECIMAL: double summation order differs between engines
           -- and flips cents after round(2) on ~90-line groups; decimal
           -- addition is exact and order-independent
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2
    """,
    doc="TPC-H Q7 shape: cross-nation trade volume — the same dimension "
    "(nation) joined twice through different FK paths (customer side vs "
    "supplier side), both broadcast; only the fact-fact join shuffles",
)
def tpch_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), "s_nationkey")
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            # decimal sum: exact, order-independent (see oracle comment)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "tpch_q17_small_qty_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM (
      SELECT l_extendedprice, l_quantity,
             sum(CAST(l_quantity AS DECIMAL(18,4)))
               OVER (PARTITION BY l_partkey) AS qty_sum,
             count(*) OVER (PARTITION BY l_partkey) AS cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#11')
    WHERE l_quantity * 5 * cnt < CAST(qty_sum AS DOUBLE)
    """,
    doc="TPC-H Q17 shape: correlated per-part average threshold (qty < "
    "0.2*avg), executed as ONE partitioned window over the brand-filtered "
    "slice instead of a per-row subquery. The threshold is compared in the "
    "exact form qty*5*cnt < decimal_sum: a double 0.2*avg(double) is "
    "order-dependent AND the 0.2 literal types differently across engines "
    "(DuckDB decimal vs Spark double), which can flip borderline rows",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#11"
    ).select("p_partkey")
    # Join FIRST, then window: the correlated stats only need the brand's
    # parts, so window state is bounded by the filtered slice (the set is
    # identical — l_partkey determines p_brand). Threshold in exact form:
    # qty*5*cnt (double ops on the 2-decimal grid, exact) vs the decimal
    # window sum cast to double (deterministic) — see the oracle note.
    sliced = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        sliced.withColumn(
            "__qty_sum",
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).over(w),
        )
        .withColumn("__cnt", F.count("*").over(w))
        .filter(
            F.col("l_quantity") * 5 * F.col("__cnt")
            < F.col("__qty_sum").cast("double")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0)
            .cast("double")
            .alias("__raw")
        )
        .select(F.round("__raw", 2).alias("avg_yearly"))
    )


@_q(
    "dedup_cluster_components",
    """
    WITH RECURSIVE words AS (
      SELECT doc_id AS id,
             lang || '|' || source || '|' ||
               CAST(CAST(floor(log2(len(regexp_split_to_array(trim(text), '\\s+'))))
                    AS BIGINT) AS VARCHAR) AS blk,
             regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT id, blk,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
      FROM words WHERE len(w) >= 3
    ), pairs AS (
      SELECT a_id, b_id FROM (
        SELECT a.id AS a_id, b.id AS b_id,
               round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                     len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
        FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id) v
      WHERE jaccard >= 0.1
    ), edges AS (
      SELECT a_id AS s, b_id AS d FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ), walk(s, d) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s
    )
    SELECT s AS doc_id, min(d) AS cluster_id FROM walk GROUP BY s
    """,
    headline=True,
    doc="Near-dup CLUSTERING: connected components over the exact ngram-"
    "jaccard pairs (min-label propagation; cluster_id = smallest member — "
    "the doc a keep-first policy retains). Every doc appears; singletons "
    "cluster as themselves. Oracle replays it as a recursive CTE closure",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "blk",
        F.concat_ws(
            "|",
            "lang",
            "source",
            F.floor(
                F.log2(F.size(F.split(F.trim("text"), r"\s+")))
            ).cast("long").cast("string"),
        ),
    )
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", "blk", n=3, min_jaccard=0.0
    )
    pairs = pairs.withColumn("jaccard", F.round("jaccard", 4)).filter(
        F.col("jaccard") >= 0.1
    )
    return dedup.connected_components(
        pairs, "a_id", "b_id",
        all_nodes=docs.select("doc_id"), node_col="doc_id",
    )


@_q(
    "text_top_words",
    """
    SELECT word, n, df FROM (
      SELECT word, count(*) AS n, count(DISTINCT doc_id) AS df,
             row_number() OVER (ORDER BY count(*) DESC, word) AS rk
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
      WHERE word <> ''
      GROUP BY word) v
    WHERE rk <= 20
    """,
    doc="Vocabulary building: corpus-wide top-20 words by term frequency "
    "with document frequency — explode (narrow) then one word-keyed shuffle "
    "with map-side partial aggregation, then TakeOrdered top-k; the shape "
    "behind tokenizer-vocab and stopword-list construction at corpus scale",
)
def text_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count("*").alias("n"), F.count_distinct("doc_id").alias("df")
    )
    from lakehouse_spark.operators import sorts

    return sorts.top_n(counts, [F.desc("n"), F.asc("word")], 20).select(
        "word", "n", "df"
    )


@_q(
    "text_tfidf_top_term",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf
      FROM words WHERE word <> '' GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM words
      WHERE word <> '' GROUP BY word
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, word AS top_term,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM (
      SELECT t.doc_id, t.word, t.tf, d.df, n.n_docs,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) DESC, t.word
             ) AS rk
      FROM tf t JOIN df d USING (word) CROSS JOIN n)
    WHERE rk = 1
    """,
    doc="TF-IDF featurization: each document's highest-scoring term "
    "(tf * ln(N/df), term-asc tie-break). Two shuffles — (doc, word) tf and "
    "word df — then a broadcast of the df side back onto tf; the standard "
    "sparse-featurization shape at corpus scale",
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar, the oracle's CROSS JOIN n
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_), "word").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("word").alias("top_term"),
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


@_q(
    "profile_documents",
    """
    SELECT 'doc_id' AS col, count(doc_id) AS n_nonnull,
           count(DISTINCT doc_id) AS n_distinct FROM documents
    UNION ALL
    SELECT 'lang', count(lang), count(DISTINCT lang) FROM documents
    UNION ALL
    SELECT 'source', count(source), count(DISTINCT source) FROM documents
    UNION ALL
    SELECT 'n_chars', count(n_chars), count(DISTINCT n_chars) FROM documents
    """,
    doc="Data profiling: per-column non-null + exact distinct counts in ONE "
    "pass (Spark side aggregates all columns together, then unpivots — the "
    "oracle's 4-scan UNION is the semantic spec, not the plan)",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    agg = docs.agg(
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.count_distinct(c).alias(f"nd_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return agg.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col, n_nonnull, n_distinct)"
        )
    )


@_q(
    "rollup_gapfill_daily",
    """
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n
    FROM spine s LEFT JOIN daily d USING (day)
    """,
    doc="Time-series gap fill: a generated date spine (sequence over the "
    "observed min/max — two scalar aggregates, no calendar table needed) "
    "left-joined onto sparse daily counts, zero-filling missing days. The "
    "continuity prerequisite for any windowed trend computation",
)
def rollup_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


def headline_queries() -> dict[str, QuerySpec]:
    return {k: v for k, v in CATALOG.items() if v.headline}
