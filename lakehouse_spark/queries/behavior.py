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


@_q(
    "ts_ewma_halflife",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
      FROM events GROUP BY 1
    ), idx AS (
      SELECT day, n_events,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) - 1 AS t
      FROM daily
    ), pre AS (
      SELECT day, n_events, t,
             sum(n_events * pow(2.0, t)) OVER (
               ORDER BY t ROWS UNBOUNDED PRECEDING) AS s
      FROM idx
    )
    SELECT day,
           CAST(n_events AS BIGINT) AS n_events,
           round((s / pow(2.0, t)) / (2.0 - pow(0.5, t)), 4) AS ewma,
           round(n_events / ((s / pow(2.0, t)) / (2.0 - pow(0.5, t))), 4)
             AS ratio
    FROM pre
    """,
    doc=(
        "EWMA anomaly baseline over the daily event volume, decay 0.5/day "
        "(one-day half-life). The recursive EWMA is re-expressed as a "
        "closed-form prefix sum — sum(x_k * 2^k)/2^t, normalized by "
        "(2 - 2^-t) — so it is ONE running-sum window over the "
        "day-cardinality relation (365 rows/year however big the fact "
        "table is; the only data-sized work is the groupBy(day) count "
        "with map-side partials). Powers of two are exact in binary64 and "
        "the ordered prefix sum adds in the same sequence on both "
        "engines, so the 'floating-point' EWMA is still hash-stable "
        "cross-engine. ratio = today / yesterday's-baseline is the "
        "anomaly score a monitor would threshold."
    ),
)
def ts_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    w_idx = Window.orderBy("day")
    idx = daily.select(
        "day",
        "n_events",
        (F.row_number().over(w_idx).cast("long") - 1).alias("t"),
    )
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    pre = idx.withColumn(
        "s",
        F.sum(F.col("n_events") * F.pow(F.lit(2.0), F.col("t"))).over(w_run),
    )
    ewma = (F.col("s") / F.pow(F.lit(2.0), F.col("t"))) / (
        F.lit(2.0) - F.pow(F.lit(0.5), F.col("t"))
    )
    return pre.select(
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(ewma, 4).alias("ewma"),
        F.round(F.col("n_events") / ewma, 4).alias("ratio"),
    )


@_q(
    "a17_item_affinity_topk",
    """
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), totals AS (
      SELECT l_partkey, count(*) AS n FROM basket GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS co
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), sym AS (
      SELECT pa AS item, pb AS partner, co FROM pairs
      UNION ALL
      SELECT pb AS item, pa AS partner, co FROM pairs
    ), scored AS (
      SELECT s.item, s.partner, s.co,
             s.co / sqrt(ti.n * tp.n) AS cosine,
             row_number() OVER (
               PARTITION BY s.item
               ORDER BY s.co / sqrt(ti.n * tp.n) DESC, s.partner
             ) AS rk
      FROM sym s
      JOIN totals ti ON ti.l_partkey = s.item
      JOIN totals tp ON tp.l_partkey = s.partner
    )
    SELECT item, partner, CAST(co AS BIGINT) AS co,
           round(cosine, 6) AS cosine, CAST(rk AS INT) AS rk
    FROM scored WHERE rk <= 3
    """,
    doc=(
        "Item-item collaborative filtering: top-3 most-affine parts per "
        "part by co-purchase cosine (co / sqrt(n_a * n_b)) over order "
        "baskets. Shape: the pair space is the orderkey-keyed self-join "
        "with a<b canonical orientation — per-order fan-out is "
        "C(basket,2), bounded by basket size, never by catalog or order "
        "count; totals broadcast back onto the pair relation; the rank is "
        "windowed per item over the already-aggregated pairs. IEEE sqrt "
        "and division are correctly rounded on both engines, so ranking "
        "on the raw double is cross-engine stable (partner id breaks "
        "exact ties)."
    ),
)
def a17_item_affinity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    totals = basket.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("co"))
    )
    sym = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("partner"), "co"
    ).unionAll(
        pairs.select(
            F.col("pb").alias("item"), F.col("pa").alias("partner"), "co"
        )
    )
    ti = totals.select(F.col("l_partkey").alias("item"), F.col("n").alias("ni"))
    tp = totals.select(
        F.col("l_partkey").alias("partner"), F.col("n").alias("np")
    )
    cosine = F.col("co") / F.sqrt(F.col("ni") * F.col("np"))
    w = Window.partitionBy("item").orderBy(
        cosine.desc(), F.col("partner").asc()
    )
    return (
        sym.join(F.broadcast(ti), "item")
        .join(F.broadcast(tp), "partner")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "item",
            "partner",
            F.col("co").cast("long").alias("co"),
            F.round(cosine, 6).alias("cosine"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


@_q(
    "a18_survival_retention",
    """
    WITH life AS (
      SELECT user_id,
             date_diff('microsecond', min(ts), max(ts)) // 86400000000
               AS lifetime_days
      FROM events GROUP BY user_id
    ), horizon AS (
      SELECT * FROM (VALUES (0), (7), (14), (21), (28)) v(t_days)
    )
    SELECT h.t_days,
           CAST(count(*) FILTER (WHERE l.lifetime_days >= h.t_days)
                AS BIGINT) AS n_surviving,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(count(*) FILTER (WHERE l.lifetime_days >= h.t_days)
                      AS DOUBLE) / count(*), 4) AS survival
    FROM horizon h CROSS JOIN life l
    GROUP BY h.t_days
    """,
    doc=(
        "Survival / retention curve: the fraction of users still active "
        "at horizon t (lifetime = exact integer days between first and "
        "last event, microsecond math — no calendar-boundary ambiguity "
        "between engines). ONE per-user shuffle produces the "
        "user-cardinality lifetime relation; the horizon grid is a "
        "5-literal array exploded onto it (narrow, no join operator), so "
        "the curve costs O(users x horizons) work, not extra passes over "
        "events."
    ),
)
def a18_survival_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        (
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            )
            / F.lit(86400000000)
        )
        .cast("long")
        .alias("lifetime_days")
    )
    # Literal horizon grid via explode — a narrow 5x fan-out of the
    # user-cardinality relation, no join operator at all (a crossJoin
    # here would plan as BroadcastNestedLoopJoin).
    horizons = F.array(*[F.lit(t) for t in (0, 7, 14, 21, 28)])
    surv = F.count(F.when(F.col("lifetime_days") >= F.col("t_days"), 1))
    return (
        life.select("lifetime_days", F.explode(horizons).alias("t_days"))
        .groupBy("t_days")
        .agg(
            surv.cast("long").alias("n_surviving"),
            F.count("*").cast("long").alias("n_users"),
            F.round(surv.cast("double") / F.count("*"), 4).alias("survival"),
        )
    )


@_q(
    "agg_benford",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), expected AS (
      SELECT digit, CAST(p AS DOUBLE) AS p_benford FROM (VALUES
        (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691),
        (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
        (9, 0.045757)) v(digit, p)
    )
    SELECT e.digit,
           CAST(count(d.digit) AS BIGINT) AS n,
           round(CAST(count(d.digit) AS DOUBLE)
                 / (SELECT count(*) FROM digits), 4) AS share,
           e.p_benford,
           round(abs(CAST(count(d.digit) AS DOUBLE)
                     / (SELECT count(*) FROM digits) - e.p_benford), 4)
             AS abs_dev
    FROM expected e LEFT JOIN digits d ON d.digit = e.digit
    GROUP BY e.digit, e.p_benford
    """,
    doc=(
        "Benford's-law audit of order totals: observed first-significant-"
        "digit distribution vs the log10(1+1/d) expectation (pinned as "
        "shared literals, so no cross-engine log wobble). The digit "
        "extraction is pure string math on the integer part — "
        "scan-speed, no UDF; one 9-group aggregation. The fraud-"
        "analytics shape: a ledger whose digit shares drift from the "
        "Benford column is the audit flag."
    ),
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    total = digits.count()
    expected = orders.sparkSession.createDataFrame(
        [
            (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691),
            (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
            (9, 0.045757),
        ],
        "digit int, p_benford double",
    )
    # Aggregate FIRST (map-side partials onto <=9 groups), then join the
    # two digit-cardinality relations — the fact table is scanned once and
    # never joined row-level.
    counts = digits.groupBy("digit").agg(F.count("*").alias("n_raw"))
    n = F.coalesce(F.col("n_raw"), F.lit(0)).cast("long")
    share = n.cast("double") / F.lit(total)
    return (
        expected.join(counts, "digit", "left")
        .select(
            "digit",
            n.alias("n"),
            F.round(share, 4).alias("share"),
            "p_benford",
            F.round(F.abs(share - F.col("p_benford")), 4).alias("abs_dev"),
        )
    )


@_q(
    "scd2_intervals",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts AS valid_from
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) AS valid_to,
           CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY valid_from) IS NULL
                THEN true ELSE false END AS is_current
    FROM changes
    """,
    doc=(
        "SCD type-2 interval construction from an event log: collapse "
        "consecutive repeats of each user's event_type (change-point "
        "detection via lag), then [valid_from, valid_to) intervals via "
        "lead, open-ended current row flagged — the dimension-history "
        "build an ingest pipeline runs before point-in-time joins. ONE "
        "per-user window sort shared by both passes (the second window "
        "orders a strict subset of the first's output); per-user timelines "
        "bound the window, never the global log."
    ),
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@_q(
    "ts_anomaly_rolling_mad",
    """
    WITH counts AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT a.event_type, a.day, a.cnt,
             median(b.cnt) AS med, count(*) AS n_hist
      FROM counts a JOIN counts b
        ON a.event_type = b.event_type
       AND b.day >= a.day - 7 AND b.day <= a.day - 1
      GROUP BY a.event_type, a.day, a.cnt
    ), mad AS (
      SELECT m.event_type, m.day, m.cnt, m.med,
             median(abs(b.cnt - m.med)) AS mad
      FROM med m JOIN counts b
        ON m.event_type = b.event_type
       AND b.day >= m.day - 7 AND b.day <= m.day - 1
      WHERE m.n_hist >= 4
      GROUP BY m.event_type, m.day, m.cnt, m.med)
    SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt, med, mad,
           (abs(cnt - med) > 3 * mad AND mad > 0) AS is_anomaly
    FROM mad
    """,
    doc="Robust volume-anomaly detection: per (event_type, day), flag "
    "counts more than 3 rolling MADs from the trailing-7-day rolling "
    "median (>=4 days of history). Median-of-integers is exact halves in "
    "binary64 and |cnt-med| stays on the same grid, so the flags are "
    "hash-stable cross-engine where mean/stddev z-scores would not be. "
    "Scales as two self-joins over the (type, day) relation — day "
    "cardinality, not event cardinality; the only data-sized work is the "
    "initial groupBy count with map-side partials",
)
def ts_anomaly_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    hist_cond = (
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") >= F.date_sub(F.col("a.day"), 7))
        & (F.col("b.day") <= F.date_sub(F.col("a.day"), 1))
    )
    med = (
        a.join(b, hist_cond)
        .groupBy("a.event_type", "a.day", "a.cnt")
        .agg(
            F.expr("percentile(b.cnt, 0.5)").alias("med"),
            F.count("*").alias("n_hist"),
        )
        .filter(F.col("n_hist") >= 4)
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.cnt").alias("cnt"),
            "med",
        )
    )
    m, b2 = med.alias("m"), counts.alias("b")
    mad = (
        m.join(
            b2,
            (F.col("m.event_type") == F.col("b.event_type"))
            & (F.col("b.day") >= F.date_sub(F.col("m.day"), 7))
            & (F.col("b.day") <= F.date_sub(F.col("m.day"), 1)),
        )
        .groupBy("m.event_type", "m.day", "m.cnt", "m.med")
        .agg(
            F.expr("percentile(abs(b.cnt - m.med), 0.5)").alias("mad")
        )
        .select(
            F.col("m.event_type").alias("event_type"),
            F.col("m.day").alias("day"),
            F.col("m.cnt").cast("long").alias("cnt"),
            F.col("m.med").alias("med"),
            "mad",
        )
    )
    return mad.withColumn(
        "is_anomaly",
        (F.abs(F.col("cnt") - F.col("med")) > 3 * F.col("mad"))
        & (F.col("mad") > 0),
    )


@_q(
    "rollup_ohlc",
    """
    WITH seq AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value,
             row_number() OVER w_asc AS rn_a,
             row_number() OVER w_desc AS rn_d
      FROM events
      WINDOW w_asc AS (PARTITION BY event_type, CAST(ts AS DATE)
                       ORDER BY ts ASC, event_id ASC),
             w_desc AS (PARTITION BY event_type, CAST(ts AS DATE)
                        ORDER BY ts DESC, event_id DESC)
    )
    SELECT event_type, day,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM seq GROUP BY event_type, day
    """,
    doc="OHLC candle rollup per (event_type, day): open/close are the "
    "first/last observation by (ts, event_id) — explicit tie-break, so "
    "the selection is deterministic — high/low are min/max. Pure value "
    "SELECTION (no float arithmetic), hence bit-exact cross-engine. One "
    "window sort per group feeds both endpoints; group cardinality is "
    "(types x days), never event cardinality, and the groupBy runs with "
    "map-side partials",
)
def rollup_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    wa = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = ev.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return seq.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").cast("long").alias("n"),
    )


@_q(
    "j_pit_enrichment",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), dim AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ), facts AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT f.user_id, f.day, f.n_events, d.state
    FROM facts f LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND d.valid_from <= CAST(f.day AS TIMESTAMP)
     AND (d.valid_to IS NULL OR CAST(f.day AS TIMESTAMP) < d.valid_to)
    """,
    doc="Point-in-time-correct enrichment: each (user, day) fact row "
    "joins the SCD2 state interval valid AT THE DAY'S START — the "
    "no-leakage dimension join every feature pipeline needs (joining the "
    "CURRENT state would leak the future into training rows). Day 1 "
    "starts before any state exists and correctly reads NULL. Equi join "
    "on user_id with a residual interval condition — a hash join whose "
    "partitions are per-user timelines, no range blow-up; the dimension "
    "is change-points only (<<= event count)",
)
def j_pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id", "event_type", "ts",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    facts = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n_events"))
    day_start = F.col("day").cast("timestamp")
    return (
        facts.join(
            dim,
            (F.col("user_id") == F.col("d_user"))
            & (F.col("valid_from") <= day_start)
            & (F.col("valid_to").isNull() | (day_start < F.col("valid_to"))),
            "left",
        )
        .select("user_id", "day", "n_events", "state")
    )
