"""Mention-resolution pipeline (SURVEY.md §2 T1/T2/T3, J8, D1 composed).

The reference extracts @mentions from message text, BFS's the file-reference
graph they induce (with visited-set cycle protection), and dedups loaded
content by SHA-256 so each unique document is loaded once with all its
source paths credited (utils/mentions.py:15-165,
services/mention_loader.py:58-129, services/content_deduplicator.py:36-88 —
read, not copied).

Engine shape: extraction is pure Catalyst regex (no UDF), the graph walk is
the shared iterative-frontier plan, and the dedup is the hash-groupBy
operator — this module only composes them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_spark.functions.scalar import extract_mentions, normalize_mention
from lakehouse_spark.operators import dedup
from lakehouse_spark.plans import closure


def quote_mention(col: Column | str) -> Column:
    """T3 ← utils/mentions.py:127-165: render a path as an @mention —
    quoted iff it contains characters outside the simple-mention class."""
    c = F.col(col) if isinstance(col, str) else col
    simple = c.rlike(r"^[a-zA-Z0-9_\-/\.:]+$")
    return F.when(simple, F.concat(F.lit("@"), c)).otherwise(
        F.concat(F.lit('@"'), c, F.lit('"'))
    )


def mention_edges(
    docs: DataFrame, path_col: str, text_col: str
) -> DataFrame:
    """T1+T2 over a corpus: one (src, dst) row per extracted mention —
    the reference graph the BFS walks. Regex extraction runs JVM-side."""
    return (
        docs.select(
            F.col(path_col).alias("src"),
            F.explode(extract_mentions(text_col)).alias("__m"),
        )
        .select("src", normalize_mention(F.col("__m")).alias("dst"))
        .distinct()
    )


def resolve_mentions(
    docs: DataFrame,
    roots: DataFrame,
    path_col: str = "path",
    text_col: str = "content",
    max_depth: int = closure.DEFAULT_MAX_DEPTH,
) -> DataFrame:
    """J8+D1: full runtime mention resolution — from ``roots`` (paths whose
    text was just submitted), walk the mention graph transitively, load every
    reached document once, and credit all paths carrying identical content
    (the reference's ContextMessages build).

    Returns (content_sha256, content, paths ARRAY<STRING>, min_depth)."""
    edges = mention_edges(docs, path_col, text_col)
    reached = closure.bfs_reachable(edges, roots, "src", "dst", max_depth)
    loaded = docs.join(
        reached.withColumnRenamed("node", path_col), path_col
    )
    uniq = dedup.exact(loaded, text_col, path_col)
    depths = loaded.groupBy(
        F.sha2(F.col(text_col), 256).alias("content_sha256")
    ).agg(F.min("depth").alias("min_depth"))
    return uniq.withColumnRenamed(f"{path_col}s", "paths").join(
        depths, "content_sha256"
    )
