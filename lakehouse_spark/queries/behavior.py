"""User-behavior analytics entries: RFM segmentation and co-occurrence
(market-basket) analysis. Same catalog contract as every other domain
module — identical aliases both sides, integer grids for anything a
double could wobble on, explicit tie-breaks under every window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_spark.queries._core import _q, _t


@_q(
    "a12_rfm_segments",
    """
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             count(*) AS frequency,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT *,
        CAST(ntile(4) OVER (ORDER BY recency_days ASC,  o_custkey) AS BIGINT) AS r_score,
        CAST(ntile(4) OVER (ORDER BY frequency   DESC, o_custkey) AS BIGINT) AS f_score,
        CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey) AS BIGINT) AS m_score
      FROM cust
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT) AS total_cents,
           CAST(max(frequency) AS BIGINT) AS max_frequency
    FROM scored GROUP BY r_score, f_score, m_score
    """,
    doc=(
        "RFM customer segmentation: per-customer recency/frequency/monetary "
        "reduced in ONE shuffle over orders, then quartile scores from "
        "ntile windows over the customer AGGREGATE (dimension-cardinality "
        "relation, not the fact table — the global sort ranks customers, "
        "never orders; o_custkey tie-breaks make every boundary a total "
        "order). Money on the cent grid end-to-end, so segment totals are "
        "exact integers on both engines. Output is the <=64-cell segment "
        "cube a CRM would consume."
    ),
)
def a12_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    ref = orders.agg(F.max(F.to_date("o_orderdate"))).collect()[0][0]
    cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(ref), F.max(F.to_date("o_orderdate"))).alias(
            "recency_days"
        ),
        F.count("*").alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("monetary_cents"),
    )
    scored = (
        cust.withColumn(
            "r_score",
            F.ntile(4)
            .over(Window.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
            .cast("long"),
        )
        .withColumn(
            "f_score",
            F.ntile(4)
            .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
            .cast("long"),
        )
        .withColumn(
            "m_score",
            F.ntile(4)
            .over(
                Window.orderBy(F.desc("monetary_cents"), F.asc("o_custkey"))
            )
            .cast("long"),
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.sum("monetary_cents").alias("total_cents"),
        F.max("frequency").alias("max_frequency"),
    )


@_q(
    "a13_copurchase_pairs",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), totals AS (
      SELECT event_type, count(*) AS n_type FROM ut GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(floor(1000000.0 * p.n_both *
                      (SELECT count(DISTINCT user_id) FROM ut)
                      / (ta.n_type * tb.n_type)) AS BIGINT) AS lift_ppm
    FROM pairs p
    JOIN totals ta ON ta.event_type = p.type_a
    JOIN totals tb ON tb.event_type = p.type_b
    """,
    doc=(
        "Co-occurrence (market-basket) analysis over event types: which "
        "behaviors the same users exhibit together, with lift = "
        "P(a,b)/(P(a)P(b)) on an integer ppm grid (exact under binary64 — "
        "every intermediate stays below 2^53). Shape: distinct "
        "(user, type) is one shuffle; the self-join is keyed on user_id "
        "with a<b canonical orientation (each pair once, no mirror "
        "blow-up); per-user fan-out is bounded by the type-vocabulary "
        "size, NOT by event count — the same bounded-basket argument as "
        "the triangle-counting entry. Type totals are a broadcast-scale "
        "relation."
    ),
)
def a13_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().count()
    totals = ut.groupBy("event_type").agg(F.count("*").alias("n_type"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    ta = totals.select(
        F.col("event_type").alias("type_a"), F.col("n_type").alias("na")
    )
    tb = totals.select(
        F.col("event_type").alias("type_b"), F.col("n_type").alias("nb")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.floor(
                1000000.0 * F.col("n_both") * F.lit(n_users)
                / (F.col("na") * F.col("nb"))
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )
