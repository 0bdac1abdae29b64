"""Iterative closure plans — recursive hierarchy traversal without recursive
CTEs (SURVEY.md §2.3 J3/J4/J8/J9).

The reference walks parent→child session trees (routers/sessions.py:461-516)
and BFS's a mention graph with a visited set (mention_loader.py:92-124),
both in-memory recursion. Spark SQL has no recursive CTE, so these are
driver-side loops of DataFrame joins — each iteration is one distributed
join, the loop depth is the graph depth (bounded: the reference caps
traversal depth at 10, amplified_directory_service.py:252-257, and we adopt
the same default).

Scale notes:
- Each frontier is checkpointed via `localCheckpoint()` to cut the lineage
  (otherwise iteration i re-executes all i-1 previous joins).
- The frontier is usually tiny relative to the edge table → broadcast it.
- Termination rides the SAME action that materializes the step: an
  Observation on the checkpointed plan returns the row count, so no
  separate isEmpty()/count() job re-reads the step each round.
- ``visited`` is a lazy union of the checkpointed steps — each child is
  already materialized, so the union needs no re-checkpoint; the old
  per-round ``visited.localCheckpoint()`` recopied the WHOLE visited set
  every iteration (O(depth × |visited|) total writes).
- The DuckDB oracle side expresses the same closure as WITH RECURSIVE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

DEFAULT_MAX_DEPTH = 10  # ← reference's scan-depth cap


def descendants(
    edges: DataFrame,
    seeds: DataFrame,
    parent_col: str,
    child_col: str,
    max_depth: int = DEFAULT_MAX_DEPTH,
    include_seeds: bool = True,
) -> DataFrame:
    """J3: transitive children of ``seeds`` over (parent→child) edges, with
    a per-row ``depth`` (seeds = 0). Cycle-safe: the visited anti-join drops
    re-reached nodes, so each node is emitted once at its minimum depth.

    ``seeds`` must have one column named ``child_col`` (the node id).
    """
    node = child_col
    frontier = seeds.select(F.col(node)).distinct().withColumn(
        "depth", F.lit(0)
    ).localCheckpoint(eager=True)
    visited = frontier
    for depth in range(1, max_depth + 1):
        obs = Observation()
        step = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed(node, parent_col)),
                parent_col,
            )
            .select(F.col(node))
            .distinct()
            .join(visited.select(node), node, "left_anti")
            .withColumn("depth", F.lit(depth))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if obs.get["n"] == 0:
            break
        visited = visited.unionByName(step)
        frontier = step
    return visited if include_seeds else visited.filter(F.col("depth") > 0)


def bfs_reachable(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str,
    dst_col: str,
    max_depth: int = DEFAULT_MAX_DEPTH,
) -> DataFrame:
    """J8: mention-graph BFS with visited-set dedup (cycles, diamonds, and
    self-loops are all safe). Returns (node, depth) — first-reach depth.

    Same loop as :func:`descendants` but over an arbitrary (src→dst) edge
    relation keyed by node id column ``node``."""
    seeds_n = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    frontier = seeds_n.withColumn("depth", F.lit(0)).localCheckpoint(eager=True)
    visited = frontier
    for depth in range(1, max_depth + 1):
        obs = Observation()
        step = (
            edges.select(
                F.col(src_col).alias("node"), F.col(dst_col).alias("__next")
            )
            .join(F.broadcast(frontier.select("node")), "node")
            .select(F.col("__next").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(depth))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if obs.get["n"] == 0:
            break
        visited = visited.unionByName(step)
        frontier = step
    return visited


def cascade_delete_targets(
    table: DataFrame,
    seeds: DataFrame,
    id_col: str,
    parent_col: str,
    max_depth: int = DEFAULT_MAX_DEPTH,
) -> DataFrame:
    """J4: rows of ``table`` to delete = closure of seeds over the
    self-referencing (parent→child) relation. Feed the result to the
    mutation layer's delete."""
    edges = table.select(
        F.col(parent_col), F.col(id_col)
    ).filter(F.col(parent_col).isNotNull())
    closure = descendants(
        edges, seeds.select(F.col(seeds.columns[0]).alias(id_col)),
        parent_col, id_col, max_depth,
    )
    return table.join(closure.select(id_col), id_col, "left_semi")


def nearest_ancestor_attr(
    nodes: DataFrame,
    dirs: DataFrame,
    path_col: str,
    attr_col: str,
) -> DataFrame:
    """J9 ← amplified_directory_service.py:45-95: nearest ancestor directory
    supplying an attribute (default_profile inheritance). Explode each
    node's path into all its prefixes, join against attribute-bearing dirs,
    keep the longest match — one explode + one equi join + one struct-max,
    no iteration."""
    prefixes = nodes.withColumn(
        "__prefix",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(F.split(F.col(path_col), "/"))),
                lambda n: F.concat_ws(
                    "/", F.slice(F.split(F.col(path_col), "/"), 1, n)
                ),
            )
        ),
    )
    carrier = dirs.filter(F.col(attr_col).isNotNull()).select(
        F.col(path_col).alias("__prefix"), F.col(attr_col).alias("__attr")
    )
    hit = prefixes.join(F.broadcast(carrier), "__prefix").groupBy(path_col).agg(
        F.max(
            F.struct(F.length("__prefix").alias("l"), F.col("__attr").alias("a"))
        ).alias("__m")
    )
    return nodes.join(hit, path_col, "left").select(
        nodes["*"], F.col("__m.a").alias(f"inherited_{attr_col}")
    )


def clone_id_mapping(
    nodes: DataFrame,
    node_col: str,
    seed: str | None = None,
    prefix: str = "session_",
) -> DataFrame:
    """(old id → fresh id) mapping for a subtree clone (J3→clone composition;
    reference: amplifierd/routers/sessions.py:398-399 `session_{uuid4().hex
    [:8]}` per cloned node).

    With ``seed`` the fresh ids are DETERMINISTIC — ``prefix + sha256(seed ||
    ':' || old_id)[:8]`` — so clones are replayable in tests and
    differential oracles (DuckDB: ``'session_' || substr(sha256(seed || ':'
    || id), 1, 8)``). Without a seed, uuid-derived ids match the reference's
    nondeterminism. Either way the mapping is pinned with localCheckpoint:
    every consumer (sessions/messages/events rewrites) must see the SAME
    ids, and a lazy random column would re-roll per action."""
    old = F.col(node_col).cast("string")
    if seed is not None:
        fresh = F.substring(
            F.sha2(F.concat(F.lit(f"{seed}:"), old), 256), 1, 8
        )
    else:
        fresh = F.substring(
            F.regexp_replace(F.expr("uuid()"), "-", ""), 1, 8
        )
    return (
        nodes.select(F.col(node_col), F.concat(F.lit(prefix), fresh).alias("new_id"))
        .localCheckpoint(eager=True)
    )
