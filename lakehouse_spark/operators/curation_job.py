"""The whole training-data pipeline as one call: quality gate → exact
dedup → MinHash near-dup → benchmark decontamination → split/shard export,
with a per-stage funnel report.

This is the composition the individual operators exist for. Stage order
matters at 100 TB and is fixed here deliberately:

1. quality + Gopher rules FIRST (per-row, scan speed — cheapest rejection
   per byte, shrinks everything downstream);
2. exact dedup (one hash shuffle) before near-dup (banded join) — exact
   copies would otherwise inflate every LSH bucket;
3. near-dup keeps the SMALLEST doc id of each band-cluster (first-wins,
   deterministic);
4. decontamination last — it must see the final candidate set, and the
   bloom prescreen keeps its broadcast footprint constant;
5. export with hash-deterministic split/shard placement.

Every stage is the already-tested operator; the job only wires them and
counts the casualties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_spark.operators import dedup, export, text


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    bench: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_jaccard: float = 0.5,
    n_shards: int = 8,
) -> dict[str, int]:
    """Run the full funnel and export survivors; returns per-stage counts
    (``n_input``, ``n_after_quality``, ``n_after_exact``,
    ``n_after_neardup``, ``n_after_decontam`` == exported rows)."""
    stats: dict[str, int] = {"n_input": docs.count()}

    scored = text.quality_score(docs, text_col)
    gopher = text.gopher_rules(docs, id_col, text_col).select(
        id_col, "gopher_pass"
    )
    passed = (
        scored.join(gopher, id_col)
        .filter((F.col("quality_score") >= min_quality) & F.col("gopher_pass"))
        .select(*docs.columns)
    )
    stats["n_after_quality"] = passed.count()

    exact = dedup.exact(passed, text_col, id_col).select(
        F.array_min(f"{id_col}s").alias(id_col)
    )
    passed = passed.join(exact, id_col, "left_semi")
    stats["n_after_exact"] = passed.count()

    pairs = dedup.minhash_near_duplicates(
        passed, id_col, text_col, min_jaccard=min_jaccard
    )
    # first-wins: drop the larger id of every verified near-dup pair
    losers = pairs.select(F.col("b_id").alias(id_col)).distinct()
    passed = passed.join(losers, id_col, "left_anti")
    stats["n_after_neardup"] = passed.count()

    flagged = text.bloom_decontaminate(
        passed, bench, id_col, text_col
    ).filter("contaminated")
    passed = passed.join(flagged.select(id_col), id_col, "left_anti")
    stats["n_after_decontam"] = passed.count()

    export.export_training_shards(passed, out_dir, id_col=id_col, n_shards=n_shards)
    dedup.release_caches()
    return stats
