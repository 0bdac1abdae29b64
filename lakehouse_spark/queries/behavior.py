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


@_q(
    "a14_channel_attribution",
    """
    WITH ordered AS (
      SELECT user_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    ), u AS (
      SELECT user_id,
             max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
             max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS purchase_cents
      FROM ordered GROUP BY user_id
    ), ft AS (
      SELECT first_type AS channel,
             CAST(count(*) AS BIGINT) AS first_users,
             CAST(sum(purchase_cents) AS BIGINT) AS first_cents
      FROM u GROUP BY 1
    ), lt AS (
      SELECT last_type AS channel,
             CAST(count(*) AS BIGINT) AS last_users,
             CAST(sum(purchase_cents) AS BIGINT) AS last_cents
      FROM u GROUP BY 1
    )
    SELECT coalesce(ft.channel, lt.channel) AS channel,
           coalesce(first_users, 0) AS first_users,
           coalesce(first_cents, 0) AS first_cents,
           coalesce(last_users, 0) AS last_users,
           coalesce(last_cents, 0) AS last_cents
    FROM ft FULL OUTER JOIN lt ON ft.channel = lt.channel
    """,
    doc=(
        "First-touch vs last-touch channel attribution: each user's "
        "lifetime purchase value (cent grid) credited to their first and "
        "their last event type. Spark side is ONE shuffle — "
        "groupBy(user_id) with min_by/max_by over a (ts, event_id) struct "
        "(total order, so both touches are deterministic) plus the "
        "conditional cent sum — then two channel-cardinality aggregates "
        "and a tiny full outer join; no window over the fact table at "
        "all, so nothing data-sized is globally sorted."
    ),
)
def a14_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    u = ev.groupBy("user_id").agg(
        F.min_by("event_type", ordkey).alias("first_type"),
        F.max_by("event_type", ordkey).alias("last_type"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("purchase_cents"),
    )
    ft = u.groupBy(F.col("first_type").alias("channel")).agg(
        F.count("*").alias("first_users"),
        F.sum("purchase_cents").alias("first_cents"),
    )
    lt = u.groupBy(F.col("last_type").alias("channel")).agg(
        F.count("*").alias("last_users"),
        F.sum("purchase_cents").alias("last_cents"),
    )
    return (
        ft.join(lt, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("first_users", F.lit(0)).alias("first_users"),
            F.coalesce("first_cents", F.lit(0)).alias("first_cents"),
            F.coalesce("last_users", F.lit(0)).alias("last_users"),
            F.coalesce("last_cents", F.lit(0)).alias("last_cents"),
        )
    )


@_q(
    "a15_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), tot AS (
      SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS tot
      FROM pairs GROUP BY 1
    )
    SELECT p.prev_type, p.next_type, p.n_transitions,
           CAST(floor(1000000.0 * p.n_transitions / t.tot) AS BIGINT)
             AS prob_ppm
    FROM pairs p JOIN tot t USING (prev_type)
    """,
    doc=(
        "First-order Markov transition matrix over event types: "
        "P(next | prev) on an integer ppm grid. The lag window partitions "
        "by user_id (bounded per-user sequences — the sessionize-scale "
        "argument), then everything downstream is type-vocabulary-sized: "
        "the transition counts, the per-prev totals, and the broadcast "
        "join between them. The |V|^2 output is what a next-event "
        "predictor or anomaly scorer consumes."
    ),
)
def a15_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n_transitions"))
    tot = pairs.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("tot")
    )
    return pairs.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.floor(1000000.0 * F.col("n_transitions") / F.col("tot"))
        .cast("long")
        .alias("prob_ppm"),
    )


@_q(
    "a16_event_paths",
    """
    WITH seq AS (
      SELECT event_type,
             lag(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS p2
      FROM events
    )
    SELECT p2 || '>' || p1 || '>' || event_type AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
    doc=(
        "Top-10 three-step behavior paths (event-type trigrams per user "
        "timeline). One window pass (two lags share the SAME window spec, "
        "so Catalyst evaluates them in a single sort per user partition), "
        "then a |V|^3-bounded aggregate and a TakeOrdered top-k with a "
        "path tie-break — the funnel-discovery shape."
    ),
)
def a16_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from lakehouse_spark.operators import sorts

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "p2", "p1", "event_type").alias("path")
    ).agg(F.count("*").alias("n"))
    return sorts.top_n(paths, [F.desc("n"), F.asc("path")], 10).select(
        "path", "n"
    )
