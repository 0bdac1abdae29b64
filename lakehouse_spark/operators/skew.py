"""Skew mitigation (engine addition; SURVEY.md §4 physical-layout notes).

The reference never shuffles, so it has no skew problem — a 1000-executor
cluster does. Two standard techniques, both pure DataFrame ops:

- **salted aggregation**: decomposable aggregates (sum/count/min/max) run in
  two phases — phase 1 groups on (key, salt) spreading one hot key over N
  reducers, phase 2 re-combines per key. Results are EXACTLY the direct
  group-by's (oracle-checked in the catalog); only the shuffle distribution
  changes.
- **salted broadcast join**: replicate the small side N× with salt ids so a
  skewed probe side spreads its hot keys. AQE's skew-join splitting covers
  the sort-merge case at runtime; explicit salting remains useful when the
  skew is known and extreme (one key ≫ one partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase decomposable aggregation: ``aggs`` maps output column →
    (input column, fn) with fn ∈ {sum, count, min, max}. A count re-combines
    with sum in phase 2; the rest re-combine with themselves."""
    _PHASE2 = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, (_, fn) in aggs.items():
        if fn not in _PHASE2:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            getattr(F, _PHASE2[fn])(out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate the small side across ``n_salts`` salt ids and join on
    (key, salt): a hot probe key spreads over n_salts tasks instead of one.
    The small side must tolerate n_salts× replication (it's broadcast
    anyway)."""
    salted = skewed.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(
        F.broadcast(replicated), [key, "__salt"], how
    ).drop("__salt")


def top_keys(df: DataFrame, key_cols: list[str], n: int = 20) -> DataFrame:
    """Skew diagnosis: the n heaviest keys with their row counts — run this
    before deciding to salt."""
    counts = df.groupBy(*key_cols).count()
    return counts.orderBy(F.desc("count"), *key_cols).limit(n)
