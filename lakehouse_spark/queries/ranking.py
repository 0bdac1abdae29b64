"""Relevance-ranking entries: BM25 keyword scoring over the documents
corpus, built on the same posting-list shape as the inverted-index
operator (operators/search.py). Cross-engine determinism: every double
is produced by an IDENTICAL expression tree on both engines (same
literals, same parenthesisation, integer inputs), then snapped to an
integer ppm grid before the sum — so the catalog hash compares exact
integers, never engine-ordered double sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_spark.queries._core import _q, _t

# The benchmark query: mid-df terms of the synthetic corpus (df ~390/500
# each), so scores separate on tf and length normalisation, not on rare-term
# idf spikes.
_BM25_TERMS = ("hash", "join", "stream")


@_q(
    "text_bm25_rank",
    f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), toks AS (
      SELECT doc_id, word FROM words WHERE word <> ''
    ), dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n_docs,
             CAST((SELECT count(*) FROM toks) AS DOUBLE)
               / (SELECT count(*) FROM documents) AS avgdl
    ), tf AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE word IN {_BM25_TERMS!r}
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks WHERE word IN {_BM25_TERMS!r}
      GROUP BY word
    ), scored AS (
      SELECT t.doc_id,
             CAST(floor(
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * ((t.tf * 2.2)
                  / (t.tf + 1.2 * (0.25 + 0.75 * (l.dl / s.avgdl))))
               * 1000000.0 + 0.5) AS BIGINT) AS term_ppm
      FROM tf t
      JOIN df d USING (word)
      JOIN dl l USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id, CAST(sum(term_ppm) AS BIGINT) AS bm25_ppm
    FROM scored GROUP BY doc_id
    ORDER BY bm25_ppm DESC, doc_id
    LIMIT 20
    """,
    doc=(
        "BM25 top-20 ranking (k1=1.2, b=0.75, Lucene idf) for a fixed "
        "3-term query. Shape at corpus scale: the posting relation is "
        "filtered to the QUERY terms before any shuffle (O(matched "
        "postings), the inverted-index argument from operators/search.py); "
        "df and the global length stats are scalar/broadcast-sized; the "
        "only data-sized shuffles are the per-doc tf and dl aggregates. "
        "Per-term scores snap to an integer ppm grid before the per-doc "
        "sum, so the ranking is reproducible bit-for-bit across engines "
        "and partitionings."
    ),
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    n_toks = toks.count()
    # Same two exact-integer divisions as the oracle's stats CTE.
    avgdl = float(n_toks) / n_docs
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    hits = toks.filter(F.col("word").isin(list(_BM25_TERMS)))
    tf = hits.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = hits.groupBy("word").agg(
        F.count_distinct("doc_id").alias("df")
    )
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.lit(avgdl)))
    )
    scored = (
        tf.join(F.broadcast(df_), "word")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.floor(idf * tf_part * 1000000.0 + 0.5)
            .cast("long")
            .alias("term_ppm"),
        )
    )
    from lakehouse_spark.operators import sorts

    per_doc = scored.groupBy("doc_id").agg(
        F.sum("term_ppm").alias("bm25_ppm")
    )
    return sorts.top_n(
        per_doc, [F.desc("bm25_ppm"), F.asc("doc_id")], 20
    ).select("doc_id", "bm25_ppm")
