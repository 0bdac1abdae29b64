"""lakehouse_spark — a PySpark-native event-log / session analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
``payneio/lakehouse`` (reference surveyed in SURVEY.md) as an idiomatic
PySpark engine: DataFrame/SQL logical plans optimized by Catalyst, stateful
sessionization via ``applyInPandas``, Structured Streaming for live event
fan-out, and a Parquet-backed mutation layer.

Package map
-----------
- ``session``   — SparkSession builder tuned for the engine (Arrow, AQE).
- ``schemas``   — explicit StructTypes for every logical table (never infer).
- ``io``        — table loading + catalog registration for the test datasets.
- ``operators`` — the operator inventory from SURVEY.md §2: filters, joins,
                  aggregates, sorts, windowing, sessionization, dedup,
                  similarity search, text analysis, multimodal plumbing.
- ``functions`` — scalar function library (truncation, interval parse, cron).
- ``plans``     — iterative/recursive plan helpers (hierarchy closure, BFS).
- ``streaming`` — Structured Streaming flavors of the stateful operators.
- ``mutation``  — append / upsert / delete-last / retention over Parquet
                  (Delta-gated where available).
"""

__version__ = "0.1.0"

from lakehouse_spark.session import get_spark  # noqa: F401


def __getattr__(name):
    """Lazy top-level conveniences (import cost stays near zero until used):
    ``SessionLake`` (the facade), ``TableStore`` (versioned tables),
    ``CATALOG`` (the query catalog), ``AnnIndex`` / ``DedupIndex``
    (persisted indexes)."""
    if name == "SessionLake":
        from lakehouse_spark.api import SessionLake

        return SessionLake
    if name == "TableStore":
        from lakehouse_spark.mutation.store import TableStore

        return TableStore
    if name == "CATALOG":
        from lakehouse_spark.queries import CATALOG

        return CATALOG
    if name == "AnnIndex":
        from lakehouse_spark.operators.similarity import AnnIndex

        return AnnIndex
    if name == "DedupIndex":
        from lakehouse_spark.operators.dedup import DedupIndex

        return DedupIndex
    if name == "InvertedIndex":
        from lakehouse_spark.operators.search import InvertedIndex

        return InvertedIndex
    if name == "MaterializedAgg":
        from lakehouse_spark.mutation.mview import MaterializedAgg

        return MaterializedAgg
    if name == "run_curation":
        from lakehouse_spark.operators.curation_job import run_curation

        return run_curation
    if name == "scd2_history":
        from lakehouse_spark.mutation.scd import scd2_history

        return scd2_history
    if name == "collect_with_metrics":
        from lakehouse_spark.plans.metrics import collect_with_metrics

        return collect_with_metrics
    if name == "LakeCatalog":
        from lakehouse_spark.catalog import LakeCatalog

        return LakeCatalog
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
