"""Persisted inverted index: build/search equals the full scan, append-only
add() and remove() keep it consistent, and a reopened instance serves the
same index (durability through the TableStore)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark.operators.search import InvertedIndex, and_search, postings


def _scan_answer(docs, terms):
    cond = None
    for t in terms:
        c = F.array_contains(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"), t
        )
        cond = c if cond is None else (cond & c)
    return {r.doc_id for r in docs.filter(cond).select("doc_id").collect()}


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark window merge sort"),
            (2, "spark window"),
            (3, "merge only here"),
            (4, "SPARK Window MERGE upper case forms"),
        ],
        "doc_id long, text string",
    )


def test_search_equals_full_scan(spark):
    docs = _docs(spark)
    idx = postings(docs, "doc_id", "text")
    got = {r.doc_id for r in and_search(idx, ["spark", "window", "merge"]).collect()}
    assert got == _scan_answer(docs, ["spark", "window", "merge"]) == {1, 4}


def test_duplicate_terms_and_case(spark):
    docs = _docs(spark)
    idx = postings(docs, "doc_id", "text")
    # Duplicated + mixed-case query terms must not change the required count.
    got = {r.doc_id for r in and_search(idx, ["Spark", "spark", "WINDOW"]).collect()}
    assert got == {1, 2, 4}


def test_persisted_index_add_remove_reopen(spark, tmp_path):
    root = str(tmp_path / "inv")
    docs = _docs(spark)
    ix = InvertedIndex(spark, root)
    ix.build(docs, "doc_id", "text")
    assert {r.doc_id for r in ix.search(["spark", "merge"]).collect()} == {1, 4}

    ix.add(
        spark.createDataFrame([(5, "spark merge fresh")], "doc_id long, text string"),
        "doc_id",
        "text",
    )
    assert {r.doc_id for r in ix.search(["spark", "merge"]).collect()} == {1, 4, 5}

    ix.remove(spark.createDataFrame([(1,)], "doc_id long"))
    assert {r.doc_id for r in ix.search(["spark", "merge"]).collect()} == {4, 5}

    # Fresh instance over the same root reads the same committed version.
    again = InvertedIndex(spark, root)
    assert {r.doc_id for r in again.search(["spark", "merge"]).collect()} == {4, 5}
