"""Inverted-index keyword search: the derived-index surface (SURVEY §2.1
SC6 — the reference maintains per-entity JSON indexes,
``amplifierd/session_indexer.py``) re-expressed as a persisted
token → posting-list table.

At 100 TB a keyword query must not scan the corpus. The index is a
(token, doc_id) table partitionable by token: an AND-query touches only
the matched tokens' postings (filter pushdown to the token column), then
counts distinct matched terms per doc — docs holding ALL terms survive.
Cost is O(Σ posting sizes of the queried terms), independent of corpus
size. Maintenance is append-only: new documents append their postings
(TableStore versioning gives atomicity + exactly-once via txn watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_spark.mutation.store import TableStore


def postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (doc, token) pairs — whitespace tokens, lowercased. One
    explode + array_distinct per row; no shuffle until the index write."""
    toks = F.array_distinct(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    )
    # split() on an empty/whitespace-only doc yields [''] — drop the empty
    # token so it never pollutes the persisted postings.
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
    ).filter(F.col("token") != "")


def and_search(index: DataFrame, terms: list[str]) -> DataFrame:
    """Docs containing ALL ``terms``: filter the posting list to the
    queried tokens (pushed to the scan), count distinct matched terms per
    doc, keep full matches. Returns a 1-column ``doc_id`` frame."""
    if not terms:
        raise ValueError("and_search requires at least one term")
    hits = index.filter(F.col("token").isin([t.lower() for t in terms]))
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("token").alias("__k"))
        .filter(F.col("__k") == len(set(t.lower() for t in terms)))
        .select("doc_id")
    )


class InvertedIndex:
    """Persisted inverted index backed by a versioned TableStore."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.store = TableStore(spark, root, key="doc_id")

    def build(self, docs: DataFrame, id_col: str, text_col: str) -> None:
        p = postings(docs, id_col, text_col)
        if self.store.exists():
            self.store.overwrite(p)
        else:
            self.store.init(p)

    def add(self, docs: DataFrame, id_col: str, text_col: str) -> None:
        """Append-only maintenance: index new docs without touching the
        existing postings (O(new docs))."""
        self.store.append(postings(docs, id_col, text_col))

    def remove(self, doc_ids: DataFrame) -> int:
        """Drop all postings of the given ``doc_id`` rows."""
        return self.store.delete_keys(doc_ids)

    def search(self, terms: list[str]) -> DataFrame:
        return and_search(self.store.read(), terms)
