"""Iterative graph algorithms as DataFrame joins (no driver-side graph,
no GraphX dependency — the same discipline as
operators/dedup.connected_components).

PageRank here is the canonical "iterative joins at scale" shape: each
round is ONE shuffle (contributions grouped by destination) plus a
broadcast-scale scalar for dangling mass; lineage is cut with
localCheckpoint on a cadence so 10+ rounds don't build a 10-deep plan.
At 100 TB the edge table partitions by src and the rank table by node;
AQE handles the power-law hub skew the same way it handles hot keys in
any aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Standard PageRank (sum of ranks = 1): uniform seed, per round

        rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + dangling/N)

    where ``dangling`` is the rank mass sitting on nodes with no out
    edges (redistributed uniformly — without it rank mass leaks and the
    sum drifts below 1). Deterministic: no sampling, fixed iteration
    count; results are reproducible to the double ulp.

    Returns (node, rank).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for i in range(iters):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "out_deg")
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        contribs = (
            e.join(with_deg, e["src"] == with_deg["node"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c_sum"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("c_sum"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
