"""Filesystem discovery sources (SURVEY.md §2.1 SC7, SC8, SC9).

The reference discovers `.amplified` marker directories by recursive glob
with a depth cap, lists immediate children with hidden-entry filtering, and
gates file-content reads on extension allowlists and size caps
(amplified_directory_service.py:239-298, routers/directories.py:56-80,
206-376 — read, not copied).

Spark mapping: `binaryFile`/`text` sources with `recursiveFileLookup` +
`pathGlobFilter`; the path metadata columns (path, length,
modificationTime) come from the source itself, so listing-shaped queries
stay distributed (a 100 TB lake's file inventory is itself big data).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_DEPTH = 10  # ← amplified_directory_service.py:252-257 depth cap


def discover_marker_files(
    spark: SparkSession,
    root: str,
    marker_glob: str = "metadata.json",
    max_depth: int = DEFAULT_MAX_DEPTH,
) -> DataFrame:
    """SC7: recursive marker-file discovery with a depth cap.

    Returns (path, dir_path, rel_path, depth, length, modification_time) for
    every marker file at most ``max_depth`` levels below ``root``. The scan
    is a distributed `binaryFile` listing (content not read: column pruning
    drops it); the depth cap is a filter on the path's segment count, the
    Spark analog of the reference's bounded rglob."""
    root = root.rstrip("/")
    base_depth = len(root.split("/"))
    listed = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", marker_glob)
        .load(root)
        .select("path", "length", F.col("modificationTime").alias("modification_time"))
    )
    clean = F.regexp_replace(F.col("path"), r"^file:/*", "/")
    depth = F.size(F.split(clean, "/")) - F.lit(base_depth) - 1
    return (
        listed.withColumn("path", clean)
        .withColumn("depth", depth.cast("int"))
        .filter(F.col("depth") <= max_depth)
        .withColumn(
            "dir_path", F.expr("substring(path, 1, length(path) - length(substring_index(path, '/', -1)) - 1)")
        )
        .withColumn(
            "rel_path",
            F.regexp_replace(F.col("dir_path"), "^" + root + "/?", ""),
        )
    )


def list_dir(
    spark: SparkSession, path: str, include_hidden: bool = False
) -> DataFrame:
    """SC8: immediate children of one directory (name, path, is_directory),
    hidden entries filtered, sorted directories-first then name — the
    reference's browse listing. Driver-side listing (one directory is small
    by definition) surfaced as a DataFrame for uniform downstream ops."""
    entries = [
        (e.name, os.path.join(path, e.name), e.is_dir())
        for e in os.scandir(path)
    ]
    df = spark.createDataFrame(
        entries or [("", "", False)],
        "name string, path string, is_directory boolean",
    )
    if not entries:
        df = df.filter(F.lit(False))
    if not include_hidden:
        df = df.filter(~F.col("name").startswith("."))
    return df.orderBy(F.desc("is_directory"), F.lower(F.col("name")))


def read_gated_files(
    spark: SparkSession,
    root: str,
    allowed_extensions: tuple[str, ...] = (".md", ".txt", ".json", ".yaml"),
    max_bytes: int = 1024 * 1024,  # ← routers/directories.py:267 1 MB text cap
) -> DataFrame:
    """SC9: gated file-content scan — extension allowlist via pathGlobFilter
    union, size cap as a pushed filter on the source's length column, text
    decoded with a lossy UTF-8 fallback (the reference's encoding fallback).

    Returns (path, length, content); files over the cap or off-list never
    reach decode."""
    exts = "{" + ",".join(e.lstrip(".") for e in allowed_extensions) + "}"
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", f"*.{exts}")
        .load(root)
        .filter(F.col("length") <= max_bytes)
    )
    return raw.select(
        F.regexp_replace("path", r"^file:/*", "/").alias("path"),
        "length",
        # binary→string cast decodes UTF-8 with replacement, never throws —
        # the reference's encoding-fallback behavior
        F.col("content").cast("string").alias("content"),
    )
