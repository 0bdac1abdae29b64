"""Runtime observability: read the EXECUTED plan's SQL metrics (rows
scanned, shuffle records/bytes, spill) after an action — the numbers the
Spark UI shows, surfaced programmatically so pipelines can assert on them
(e.g. "this stage must not spill", "scan row count matches the manifest")
and ship them to monitoring.

The static complement is plans/audit.py (shape lint before running);
this module answers "what did it actually do" after running.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame


def collect_with_metrics(df: DataFrame) -> tuple[list, dict[str, int]]:
    """Run ``df`` and return (rows, aggregated metrics). Metric names are
    Spark's own (``number of output rows``, ``shuffle records written``,
    ``spill size`` ...), summed across all operators that report them —
    per-operator detail is in :func:`plan_metrics`."""
    rows = df.collect()
    return rows, plan_metrics(df, total=True)


def plan_metrics(
    df: DataFrame, total: bool = False
) -> dict[str, int] | dict[str, dict[str, int]]:
    """Metrics of an ALREADY-EXECUTED DataFrame's physical plan. With
    ``total=False``, keyed ``{operator: {metric: value}}`` (operator names
    deduplicated with #n suffixes); with ``total=True``, ``{metric: sum}``.
    """
    plan = df._jdf.queryExecution().executedPlan()
    per_op: dict[str, dict[str, int]] = {}
    seen: dict[str, int] = defaultdict(int)

    def walk(node):
        name = node.nodeName()
        seen[name] += 1
        key = name if seen[name] == 1 else f"{name}#{seen[name]}"
        mets = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            mets[str(kv._1())] = int(kv._2().value())
        if mets:
            per_op[key] = mets
        # children() returns a Scala Seq; AQE wraps the real operators —
        # AdaptiveSparkPlanExec behind executedPlan(), each QueryStageExec
        # (Result/Shuffle/BroadcastQueryStage) behind plan(). Reused stages
        # (ReusedExchange) are counted once where they first appear.
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStage"):
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(plan)
    if not total:
        return per_op
    totals: dict[str, int] = defaultdict(int)
    for mets in per_op.values():
        for k, v in mets.items():
            totals[k] += int(v)
    return dict(totals)


_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def join_strategies(df: DataFrame) -> list[str]:
    """Sorted join-operator names of an ALREADY-EXECUTED DataFrame's final
    (post-AQE) physical plan — the definitive record of which strategy
    actually ran. Round-9 purpose: the scaling instruments record this per
    measured point, so a shuffle-record blow-up between two dataset sizes
    is adjudicated mechanically — strategies identical ⇒ genuine
    super-linear pair growth; strategy flip (broadcast → sort-merge) ⇒
    planner size-threshold transition, the records delta is the join
    input becoming shuffle-visible, not a pair-space change."""
    found: set[str] = set()

    def walk(node):
        name = node.nodeName()
        for j in _JOIN_NODES:
            if name.startswith(j):
                found.add(j)
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStage"):
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return sorted(found)
