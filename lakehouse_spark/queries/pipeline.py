"""LLM training-data pipeline operators: the dedup family,
similarity search, text analysis, curation, and multimodal plumbing.

Each entry pairs a Spark DataFrame builder with a DuckDB oracle over the
driver testdata; determinism rules are in the package docstring
(lakehouse_spark/queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_spark.functions.scalar import truncate_payload
from lakehouse_spark.operators import (
    aggregates,
    dedup,
    filters,
    joins,
    similarity,
    sorts,
    text,
)
from lakehouse_spark.operators.sessionize import (
    pair_tool_events,
    turn_number,
    turn_stats,
)
from lakehouse_spark.plans import closure
from lakehouse_spark.queries._core import (
    CATALOG,
    _davg,
    _dsum,
    _q,
    _savg,
    _ssum,
    _t,
)

def _hash64_sql(expr: str, seed: int = 0) -> str:
    inner = f"concat('s{seed}:', {expr})" if seed else expr
    return f"CAST('0x' || substr(md5({inner}), 1, 15) AS BIGINT)"


def _minhash_oracle(k: int = 16, bands: int = 4, min_j: float = 0.5) -> str:
    from lakehouse_spark.operators.dedup import xor_salts

    rows = k // bands
    sig_exprs = ",\n             ".join(
        f"list_min(list_transform(hs, h -> xor(h, {salt}))) AS m{j}"
        for j, salt in enumerate(xor_salts(k))
    )
    band_rows = ", ".join(
        "({b}, [{ms}])".format(
            b=b, ms=", ".join(f"m{b * rows + i}" for i in range(rows))
        )
        for b in range(bands)
    )
    return f"""
    WITH words AS (
      SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
      FROM words WHERE len(w) >= 3
    ), sig AS (
      SELECT id, sh,
             {sig_exprs}
      FROM (SELECT id, sh,
                   list_transform(sh, s -> {_hash64_sql('s')}) AS hs
            FROM base)
    ), banded AS (
      SELECT id, b.band, b.band_sig
      FROM sig, LATERAL (VALUES {band_rows}) AS b(band, band_sig)
    ), pairs AS (
      SELECT DISTINCT a.id AS a_id, b.id AS b_id
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
    )
    SELECT a_id, b_id, jaccard FROM (
      SELECT p.a_id, p.b_id,
             round(len(list_intersect(x.sh, y.sh)) * 1.0 /
                   len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
      FROM pairs p
      JOIN base x ON x.id = p.a_id
      JOIN base y ON y.id = p.b_id) v
    WHERE jaccard >= {min_j}
    """


@_q(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    headline=True,
    doc="MinHash+LSH near-dup: shingle→sign→band→bucket-join→verify",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, k=16, bands=4, min_jaccard=0.0
    )
    return pairs.withColumn("jaccard", F.round("jaccard", 4)).filter(
        F.col("jaccard") >= 0.5
    )


@_q(
    "dedup_minhash_lsh_xxh",
    None,  # xxhash64 is JVM-native — DuckDB cannot replay the signatures
    headline=True,
    doc="MinHash+LSH near-dup on the xxhash64 production fast path "
    "(same pipeline as dedup_minhash_lsh; verified pairs still exact "
    "Jaccard, so the result set matches the md5 entry up to LSH recall)",
)
def dedup_minhash_lsh_xxh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, k=16, bands=4, min_jaccard=0.0,
        hash_mode="xxhash64",
    )
    return pairs.withColumn("jaccard", F.round("jaccard", 4)).filter(
        F.col("jaccard") >= 0.5
    )


def _simhash_oracle(bits: int = 60) -> str:
    votes = ",\n             ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id AS id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ), h AS (
      SELECT id, {_hash64_sql('tok')} AS h FROM tok
    ), votes AS (
      SELECT id, {votes}
      FROM h GROUP BY id
    )
    SELECT id AS doc_id, CAST({fingerprint} AS BIGINT) AS simhash FROM votes
    """


@_q(
    "dedup_simhash",
    _simhash_oracle(),
    doc="SimHash 60-bit fingerprints: explode + 60 static bit-vote aggregates",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text").withColumnRenamed("id", "doc_id")


@_q(
    "dedup_ngram_jaccard",
    """
    WITH words AS (
      SELECT doc_id AS id,
             lang || '|' || source || '|' ||
               CAST(CAST(floor(log2(len(regexp_split_to_array(trim(text), '\\s+'))))
                    AS BIGINT) AS VARCHAR) AS blk,
             regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT id, blk,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
      FROM words WHERE len(w) >= 3
    )
    SELECT a_id, b_id, jaccard FROM (
      SELECT a.id AS a_id, b.id AS b_id,
             round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                   len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
      FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id) v
    WHERE jaccard >= 0.1
    """,
    doc="Exact n-gram Jaccard within (lang, source, log2-length) blocks",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block key includes a log2 word-count bucket: the O(block²) pair join
    is bounded by the largest (lang, source, length-bucket) cell, so one
    giant (en, web) slice can no longer go quadratic at scale. Trade-off
    (documented): cross-bucket pairs are unseen — acceptable because this
    operator is the exact VERIFIER; candidate recall belongs to MinHash/
    SimHash upstream. Same blocking on the oracle side, so the comparison
    stays exact."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "blk",
        F.concat_ws(
            "|",
            "lang",
            "source",
            F.floor(
                F.log2(F.size(F.split(F.trim("text"), r"\s+")))
            ).cast("long").cast("string"),
        ),
    )
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", "blk", n=3, min_jaccard=0.0
    )
    return pairs.withColumn("jaccard", F.round("jaccard", 4)).filter(
        F.col("jaccard") >= 0.1
    )


@_q(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a_id, b_id, cosine FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                   6) AS cosine
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id) v
    WHERE cosine >= 0.3
    """,
    doc="Embedding-cosine near-dup within label blocks (JVM vector math)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    pairs = dedup.embedding_near_duplicates(
        emb, "vec_id", "embedding", block_col="label", min_cosine=-1.0
    )
    return pairs.withColumn("cosine", F.round("cosine", 6)).filter(
        F.col("cosine") >= 0.3
    )


@_q(
    "sim_topk_bruteforce",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
               FROM embeddings)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                   6) AS cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
               neighbor_id) AS INTEGER) AS rank
      FROM q JOIN c ON neighbor_id <> query_id) t
    WHERE rank <= 5
    """,
    headline=True,
    doc="Exact cosine top-k ANN baseline (broadcast queries, no corpus shuffle)",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return similarity.cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    )


@_q(
    "sim_ivf_topk",
    None,  # approximate by design: recall < 1 vs brute force → rows-only check
    doc="IVF-bucketed approximate top-k (probe nprobe nearest centroids)",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end learned-index path: centroids come from the DataFrame-
    native k-means (Lloyd iterations, corpus never shuffles), not a modulo
    sample — so the catalog exercises build + assign + probe together.
    Recall@k vs sim_topk_bruteforce is reported by bench.py."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    centroids = similarity.kmeans_centroids(emb, n_clusters=64, iters=3)
    bucketed = similarity.assign_buckets(emb, centroids, spill=2)
    # The testdata embeddings are near-random — the hardest case for IVF
    # (no real cluster structure to exploit). spill=2 assignment (each vector
    # indexed under its top-2 buckets) + nprobe=16 of 64 scans ~40% of the
    # corpus per query for recall@5 ≈ 0.9+ at sf0.1 (vs 0.64 with
    # single-assignment nprobe=12/50 in round 2). Clustered real embeddings
    # buy far higher recall at a much smaller probe fraction.
    return similarity.ivf_topk(
        bucketed, centroids, emb.filter(F.col("vec_id") < 10), k=5, nprobe=16
    )


@_q(
    "sim_pq_topk",
    None,  # approximate by design: recall < 1 vs brute force → rows-only check
    doc="Product-quantization approximate top-k: ADC over m=16/ksub=256 "
    "codes (16x storage shrink at dim 64 float32); corpus codes never "
    "shuffle — mapInPandas emits per-partition per-query top-k, then a "
    "tiny global reduce",
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end PQ path: codebooks trained driver-side on a deterministic
    hash-ordered sample (FAISS's quantizer-in-RAM trade), encode and ADC
    search fully distributed. The memory story complements IVF: PQ codes
    make a 100 TB float corpus fit hot storage; IVF bounds scan fan-out —
    production systems compose them (IVF-PQ)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    books = similarity.pq_train(emb, m=16, ksub=256, iters=8)
    encoded = similarity.pq_encode(emb, books)
    return similarity.pq_topk(
        encoded, books, emb.filter(F.col("vec_id") < 10), k=5
    )


@_q(
    "sim_pq_rerank_topk",
    None,  # approximate by design → rows-only check
    doc="Two-stage PQ search: ADC shortlist (4k candidates from compressed "
    "codes) + exact cosine re-rank of only those candidates — recall@5 "
    "reported by bench.py (1.0 at sf0.01, 0.98 at sf0.1, near-random "
    "vectors)",
)
def sim_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    books = similarity.pq_train(emb, m=16, ksub=256, iters=8)
    encoded = similarity.pq_encode(emb, books)
    return similarity.pq_topk_reranked(
        encoded, books, emb.filter(F.col("vec_id") < 10), emb, k=5, shortlist=4
    )


@_q(
    "sim_ivfpq_topk",
    None,  # approximate by design → rows-only check
    doc="IVF-PQ composition (the production ANN shape): probe nprobe "
    "centroid buckets (equi join bounds the SCAN), ADC-score candidates "
    "from PQ codes (bounds the BYTES — floats never flow through the "
    "join), exact re-rank of the shortlist",
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    centroids = similarity.kmeans_centroids(emb, n_clusters=64, iters=3)
    bucketed = similarity.assign_buckets(emb, centroids, spill=2)
    # residual IVF-PQ (the FAISS shape): codebooks trained on, and each
    # (vector, bucket) row encoded as, normalized-vector − bucket-centroid
    books = similarity.pq_train(emb, m=16, ksub=256, iters=8, centroids=centroids)
    bucketed_encoded = similarity.pq_encode(
        bucketed.select("vec_id", "embedding", "bucket_id"),
        books,
        centroids=centroids,
    )
    return similarity.ivfpq_topk(
        bucketed_encoded,
        books,
        centroids,
        emb.filter(F.col("vec_id") < 10),
        corpus=emb,
        k=5,
        nprobe=20,
        shortlist=4,
        residual=True,
    )


_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in text._STOPWORDS) + "]"


@_q(
    "text_quality",
    f"""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS n_chars_raw,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words_raw,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 w -> list_contains({_STOP_SQL}, lower(w)))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars_raw AS BIGINT) AS n_chars,
           CAST(n_words_raw AS BIGINT) AS n_words,
           round((n_chars_raw - (n_words_raw - 1)) * 1.0 / n_words_raw, 4) AS mean_word_len,
           round(n_punct * 1.0 / greatest(n_chars_raw, 1), 4) AS punct_ratio,
           round(n_stop * 1.0 / greatest(n_words_raw, 1), 4) AS stopword_ratio,
           round(n_upper * 1.0 / greatest(n_chars_raw, 1), 4) AS upper_ratio,
           round(CAST((CASE WHEN n_words_raw >= 5 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN n_stop * 1.0 / greatest(n_words_raw, 1) BETWEEN 0.05 AND 0.6 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN n_punct * 1.0 / greatest(n_chars_raw, 1) < 0.2 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN (n_chars_raw - (n_words_raw - 1)) * 1.0 / n_words_raw BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
               AS DOUBLE), 2) AS quality_score
    FROM feats
    """,
    doc="Quality features + composite score (C4/Gopher-style heuristics)",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.quality_score(docs, "text").select(
        "doc_id",
        "n_chars",
        "n_words",
        "mean_word_len",
        "punct_ratio",
        "stopword_ratio",
        "upper_ratio",
        "quality_score",
    )


def _langid_ratio_sql() -> str:
    """Per-language marker hit-rate columns over the word array `w`."""
    ratios = []
    for lang in text._MARKER_LANGS:
        markers = "[" + ", ".join(f"'{w}'" for w in text._LANG_MARKERS[lang]) + "]"
        ratios.append(
            f"len(list_filter(w, x -> list_contains({markers}, x))) * 1.0 /"
            f" greatest(len(w), 1) AS r_{lang}"
        )
    return ",\n             ".join(ratios)


def _langid_case_sql() -> str:
    """The lang_guess CASE over script regexes + r_<lang> ratio columns.
    Spark's struct-max tie-break picks the lexicographically LARGEST lang
    code among equal scores → the CASE chain tests in DESC-lex order."""
    langs = list(text._MARKER_LANGS)
    g = "greatest(" + ", ".join(f"r_{l}" for l in langs) + ")"
    tie_chain = "\n                       ".join(
        f"WHEN r_{l} = {g} THEN '{l}'"
        for l in sorted(langs, reverse=True)[:-1]
    )
    script_chain = "\n                ".join(
        f"WHEN len(regexp_extract_all(text, '{pat}')) > 0 THEN '{lang}'"
        for lang, pat in text._SCRIPT_LANGS
    )
    last = sorted(langs)[0]
    return f"""CASE {script_chain}
                WHEN {g} > 0 THEN
                  CASE {tie_chain}
                       ELSE '{last}' END
                ELSE 'und' END"""


def _langid_oracle() -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, text,
             list_transform(regexp_split_to_array(trim(text), '\\s+'),
                            x -> lower(x)) AS w
      FROM documents
    ), scored AS (
      SELECT doc_id, text,
             {_langid_ratio_sql()}
      FROM words
    )
    SELECT doc_id,
           {_langid_case_sql()} AS lang_guess
    FROM scored
    """


@_q(
    "text_langid",
    _langid_oracle(),
    doc="Heuristic language ID: marker-word hit rate + CJK script detection",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.lang_id("text").alias("lang_guess"))


@_q(
    "text_tokens",
    r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
    doc="Token counting: whitespace + BPE-ish regex pre-tokenization",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.whitespace_token_count("text").cast("long").alias("ws_tokens"),
        text.bpe_ish_token_count("text").cast("long").alias("bpe_ish_tokens"),
    )


@_q(
    "text_fingerprint",
    r"""
    SELECT doc_id,
           sha256(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                      '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    doc="Normalization-stable document fingerprint (lower/strip/collapse + SHA-256)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint("text").alias("fp"))


def _doc_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("asset_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("audio/wav").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") / 100.0).alias("duration_s"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


@_q(
    "mm_frame_sample_plan",
    """
    SELECT 'doc-' || doc_id AS asset_id,
           CAST(i AS INTEGER) AS frame_idx,
           round(i * 2.0, 3) AS frame_ts
    FROM (
      SELECT doc_id,
             unnest(range(0,
               CAST(greatest(floor((n_chars / 100.0) / 2.0), 1) AS BIGINT))) AS i
      FROM documents)
    """,
    doc="Multimodal: video frame-sampling plan (explode vs generate_series)",
)
def mm_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import multimodal

    assets = _doc_assets(spark, sf_dir)
    return multimodal.frame_sample_plan(assets, every_s=2.0).select(
        "asset_id", "frame_idx", F.round("frame_ts", 3).alias("frame_ts")
    )


@_q(
    "mm_resize_plan",
    """
    SELECT 'doc-' || doc_id AS asset_id, w AS width, h AS height,
           CAST(ceil(w * least(512.0 / greatest(w, h), 1.0)) AS INTEGER) AS target_width,
           CAST(ceil(h * least(512.0 / greatest(w, h), 1.0)) AS INTEGER) AS target_height
    FROM (SELECT doc_id,
                 CAST(200 + (doc_id * 37) % 1800 AS INTEGER) AS w,
                 CAST(200 + (doc_id * 53) % 1200 AS INTEGER) AS h
          FROM documents)
    """,
    doc="Multimodal: aspect-preserving resize plan (pure column math)",
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    assets = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("asset_id"),
        (200 + (F.col("doc_id") * 37) % 1800).cast("int").alias("width"),
        (200 + (F.col("doc_id") * 53) % 1200).cast("int").alias("height"),
    )
    return multimodal.resize_plan(assets, max_side=512).select(
        "asset_id", "width", "height", "target_width", "target_height"
    )


@_q(
    "mm_feature_extract",
    """
    SELECT 'doc-' || doc_id AS asset_id,
           CAST(strlen(text) AS INT) AS byte_len,
           round(CAST(len(list_filter(string_split(text, ''),
                                      c -> ascii(c) // 32 = 0)) AS DOUBLE)
                 / greatest(strlen(text), 1), 6) AS f0,
           round(CAST(len(list_filter(string_split(text, ''),
                                      c -> ascii(c) // 32 = 3)) AS DOUBLE)
                 / greatest(strlen(text), 1), 6) AS f3,
           '' AS decode_error
    FROM documents
    """,
    doc="Multimodal: Arrow-batched decode/feature extraction. The fake "
    "decoder's byte-histogram IS SQL-expressible because the synthesized "
    "payloads are utf-8 of pure-ASCII text (verified at every SF: strlen == "
    "length), so byte buckets == codepoint//32 — upgrading this entry from "
    "rows-only to a full value-hash oracle over the mapInPandas path",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import multimodal

    assets = _doc_assets(spark, sf_dir)
    feats = multimodal.extract_features(assets, decoder=multimodal.fake_decoder)
    return feats.select(
        "asset_id",
        "byte_len",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 4), 6).alias("f3"),
        # '' instead of NULL: all-None object columns break pandas-sorting
        # canonicalizers (the a5 lesson)
        F.coalesce("decode_error", F.lit("")).alias("decode_error"),
    )


def _curation_oracle() -> str:
    qscore = """round(CAST((CASE WHEN n_words_raw >= 5 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN n_stop * 1.0 / greatest(n_words_raw, 1) BETWEEN 0.05 AND 0.6 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN n_punct * 1.0 / greatest(n_chars_raw, 1) < 0.2 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN (n_chars_raw - (n_words_raw - 1)) * 1.0 / n_words_raw BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
               AS DOUBLE), 2)"""
    return f"""
    WITH words AS (
      SELECT doc_id, text,
             list_transform(regexp_split_to_array(trim(text), '\\s+'),
                            x -> lower(x)) AS w,
             length(text) AS n_chars_raw,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words_raw,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> list_contains({_STOP_SQL}, lower(x)))) AS n_stop
      FROM documents
    ), scored AS (
      SELECT doc_id, text, n_words_raw,
             {qscore} AS quality_score,
             {_langid_ratio_sql()}
      FROM words
    ), judged AS (
      SELECT doc_id, n_words_raw, quality_score,
             {_langid_case_sql()} AS lang_guess,
             row_number() OVER (
               PARTITION BY sha256(trim(regexp_replace(
                 regexp_replace(lower(text), '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
      FROM scored
    )
    SELECT doc_id, lang_guess, quality_score,
           CASE WHEN n_words_raw < 5 THEN 'too_short'
                WHEN quality_score < 0.75 THEN 'low_quality'
                WHEN lang_guess <> 'en' THEN 'language'
                WHEN rn > 1 THEN 'duplicate'
                ELSE '' END AS reject_reason,
           (CASE WHEN n_words_raw < 5 THEN 'too_short'
                 WHEN quality_score < 0.75 THEN 'low_quality'
                 WHEN lang_guess <> 'en' THEN 'language'
                 WHEN rn > 1 THEN 'duplicate'
                 ELSE NULL END) IS NULL AS keep
    FROM judged
    """


@_q(
    "pipeline_curation",
    _curation_oracle(),
    doc="End-to-end curation funnel: quality -> langid -> fingerprint "
    "first-wins dedup -> keep/reject with precedence-ordered reasons "
    "(one scan + one fingerprint shuffle)",
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = text.curate_documents(
        docs, "doc_id", "text", min_words=5, min_quality=0.75,
        allowed_langs=("en",),
    )
    # Kept rows report '' instead of NULL: mixed None/str cells break
    # pandas-sorting canonicalizers (the a5 lesson). The operator itself
    # keeps the NULL-means-kept API.
    return out.withColumn(
        "reject_reason", F.coalesce("reject_reason", F.lit(""))
    )


@_q(
    "curation_stratified_sample",
    """
    SELECT lang, doc_id, sample_rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 25
    """,
    doc="Deterministic per-stratum downsample: smallest-md5(id) rows per "
    "lang — a reproducible, engine-agnostic training subsample (one shuffle "
    "on the stratum key + WindowGroupLimit top-n)",
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id")
    return text.stratified_sample(docs, "lang", "doc_id", n_per_stratum=25)


@_q(
    "doc_repetition_score",
    """
    SELECT doc_id,
           round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams),
                 6) AS rep3
    FROM (
      SELECT doc_id,
             list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
             ) AS grams
      FROM documents
    )
    WHERE len(grams) > 0
    """,
    doc="Intra-document repetition (Gopher-style filter signal): fraction of "
    "duplicated word 3-grams per doc — pure Catalyst, per-row, scan speed",
)
def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", text.repetition_score("text", n=3).alias("rep3"))
        .filter(F.col("rep3").isNotNull())
    )


@_q(
    "curation_decontaminate",
    """
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 4),
               i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')
             )) AS gram
      FROM documents),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 5),
    hits AS (SELECT DISTINCT doc_id FROM grams
             WHERE gram IN (SELECT gram FROM bench))
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
    headline=True,
    doc="Benchmark decontamination: flag docs sharing any word 5-gram with "
    "the benchmark set (docs 0-4) — broadcast semi join on grams; the "
    "corpus never shuffles",
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    return text.decontaminate(docs, bench, "doc_id", "text", n=5)


@_q(
    "emb_quantize_int8",
    """
    SELECT vec_id,
           array_to_string(
             list_transform(emb,
                            x -> CAST(floor(x * scale + 0.5) AS INT)),
             ',') AS qvec,
           round(scale, 6) AS scale_r,
           round(list_aggregate(
             list_transform(emb,
                            x -> abs(floor(x * scale + 0.5) / scale - x)),
             'sum') / len(emb), 9) AS mae
    FROM (
      SELECT vec_id, emb,
             CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale
      FROM (
        -- float32 -> double FIRST so both engines do all math in double
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
               list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE)))) AS amax
        FROM embeddings))
    """,
    doc="Symmetric per-vector int8 quantization (4x embedding storage shrink "
    "at 100 TB) + per-row mean-abs reconstruction error; floor(x+0.5) "
    "rounding so both engines emit identical codes",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q, scale, err = similarity.quantize_int8("embedding")
    return emb.select(
        "vec_id",
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias(
            "qvec"
        ),
        F.round(scale, 6).alias("scale_r"),
        F.round(err, 9).alias("mae"),
    )


@_q(
    "dedup_cluster_components",
    """
    WITH RECURSIVE words AS (
      SELECT doc_id AS id,
             lang || '|' || source || '|' ||
               CAST(CAST(floor(log2(len(regexp_split_to_array(trim(text), '\\s+'))))
                    AS BIGINT) AS VARCHAR) AS blk,
             regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT id, blk,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
      FROM words WHERE len(w) >= 3
    ), pairs AS (
      SELECT a_id, b_id FROM (
        SELECT a.id AS a_id, b.id AS b_id,
               round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                     len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
        FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id) v
      WHERE jaccard >= 0.1
    ), edges AS (
      SELECT a_id AS s, b_id AS d FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ), walk(s, d) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s
    )
    SELECT s AS doc_id, min(d) AS cluster_id FROM walk GROUP BY s
    """,
    headline=True,
    doc="Near-dup CLUSTERING: connected components over the exact ngram-"
    "jaccard pairs (min-label propagation; cluster_id = smallest member — "
    "the doc a keep-first policy retains). Every doc appears; singletons "
    "cluster as themselves. Oracle replays it as a recursive CTE closure",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "blk",
        F.concat_ws(
            "|",
            "lang",
            "source",
            F.floor(
                F.log2(F.size(F.split(F.trim("text"), r"\s+")))
            ).cast("long").cast("string"),
        ),
    )
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", "blk", n=3, min_jaccard=0.0
    )
    pairs = pairs.withColumn("jaccard", F.round("jaccard", 4)).filter(
        F.col("jaccard") >= 0.1
    )
    return dedup.connected_components(
        pairs, "a_id", "b_id",
        all_nodes=docs.select("doc_id"), node_col="doc_id",
    )


@_q(
    "text_top_words",
    """
    SELECT word, n, df FROM (
      SELECT word, count(*) AS n, count(DISTINCT doc_id) AS df,
             row_number() OVER (ORDER BY count(*) DESC, word) AS rk
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
      WHERE word <> ''
      GROUP BY word) v
    WHERE rk <= 20
    """,
    doc="Vocabulary building: corpus-wide top-20 words by term frequency "
    "with document frequency — explode (narrow) then one word-keyed shuffle "
    "with map-side partial aggregation, then TakeOrdered top-k; the shape "
    "behind tokenizer-vocab and stopword-list construction at corpus scale",
)
def text_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count("*").alias("n"), F.count_distinct("doc_id").alias("df")
    )
    from lakehouse_spark.operators import sorts

    return sorts.top_n(counts, [F.desc("n"), F.asc("word")], 20).select(
        "word", "n", "df"
    )


@_q(
    "text_tfidf_top_term",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf
      FROM words WHERE word <> '' GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM words
      WHERE word <> '' GROUP BY word
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, word AS top_term,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM (
      SELECT t.doc_id, t.word, t.tf, d.df, n.n_docs,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) DESC, t.word
             ) AS rk
      FROM tf t JOIN df d USING (word) CROSS JOIN n)
    WHERE rk = 1
    """,
    doc="TF-IDF featurization: each document's highest-scoring term "
    "(tf * ln(N/df), term-asc tie-break). Two shuffles — (doc, word) tf and "
    "word df — then a broadcast of the df side back onto tf; the standard "
    "sparse-featurization shape at corpus scale",
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar, the oracle's CROSS JOIN n
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_), "word").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("word").alias("top_term"),
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


@_q(
    "profile_documents",
    """
    SELECT 'doc_id' AS col, count(doc_id) AS n_nonnull,
           count(DISTINCT doc_id) AS n_distinct FROM documents
    UNION ALL
    SELECT 'lang', count(lang), count(DISTINCT lang) FROM documents
    UNION ALL
    SELECT 'source', count(source), count(DISTINCT source) FROM documents
    UNION ALL
    SELECT 'n_chars', count(n_chars), count(DISTINCT n_chars) FROM documents
    """,
    doc="Data profiling: per-column non-null + exact distinct counts in ONE "
    "pass (Spark side aggregates all columns together, then unpivots — the "
    "oracle's 4-scan UNION is the semantic spec, not the plan)",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    agg = docs.agg(
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.count_distinct(c).alias(f"nd_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return agg.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col, n_nonnull, n_distinct)"
        )
    )




@_q(
    "doc_chunks_overlap",
    """
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n
      FROM documents
    ), s AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(n, 1), 24)) AS st
      FROM w WHERE n > 0
    )
    SELECT doc_id,
           CAST((st - 1) // 24 AS INTEGER) AS chunk_id,
           CAST(len(w[st:st+31]) AS INTEGER) AS n_tokens,
           sha256(array_to_string(w[st:st+31], ' ')) AS chunk_fp
    FROM s
    """,
    doc="Embedding-pipeline chunker: overlapping 32-word windows every 24 "
    "words (posexplode of sequence starts — pure Catalyst, no UDF; the "
    "fan-out happens after pushed filters). Chunk text is fingerprinted "
    "so the oracle compares content without shipping it",
)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.chunk_words(docs, "doc_id", "text", size=32, stride=24).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.sha2("chunk_text", 256).alias("chunk_fp"),
    )


@_q(
    "pii_redaction",
    """
    WITH synth AS (
      SELECT doc_id,
             text ||
             (CASE WHEN doc_id % 2 = 0
                   THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                   ELSE '' END) ||
             (CASE WHEN doc_id % 3 = 0 THEN ' call 555-123-4567 ok' ELSE '' END) ||
             (CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789 end' ELSE '' END)
               AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(t, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS INTEGER) AS n_phone,
           CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS INTEGER) AS n_ssn,
           sha256(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g'),
                 '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '[PHONE]', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g')
           ) AS redacted_fp
    FROM synth
    """,
    doc="PII detection + redaction over synthesized contact strings (the "
    "corpus itself is clean): regexp_extract_all counts per kind and "
    "chained regexp_replace redaction, most-specific pattern first — "
    "scan-speed Catalyst, RE2-safe patterns so DuckDB mirrors exactly",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" mail user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(" call 555-123-4567 ok")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit(" ssn 123-45-6789 end")
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    counts = text.pii_counts("t")
    return synth.select(
        "doc_id",
        counts["email"].cast("int").alias("n_email"),
        counts["phone"].cast("int").alias("n_phone"),
        counts["ssn"].cast("int").alias("n_ssn"),
        F.sha2(text.redact_pii("t"), 256).alias("redacted_fp"),
    )


@_q(
    "curation_train_split",
    """
    WITH b AS (
      SELECT n_chars,
             ((CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) % 10) + 10) % 10 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket < 9 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY 1
    """,
    doc="Deterministic 80/10/10 dataset split: md5-derived hash bucket per "
    "doc id — order-independent, repartition-stable, reproducible across "
    "engines and re-runs (random() splits are none of these). No shuffle "
    "until the 3-row summary",
)
def curation_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        text.hash_split(docs, "doc_id", {"train": 8, "val": 1, "test": 1})
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@_q(
    "curation_quality_resample",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE (((CAST('0x' || substr(md5('ds:' || CAST(doc_id AS VARCHAR)), 1, 15)
             AS BIGINT) % 1000000) + 1000000) % 1000000) / 1000000.0
          < least(1.0, n_chars / 400.0)
    """,
    doc="Importance resampling: keep probability proportional to a per-doc "
    "score (here length-based), decided by an md5-derived hash of the id — "
    "deterministic, reproducible, repartition-stable; the SAME ids survive "
    "every run, unlike rand() sampling. Scan-speed filter, no shuffle",
)
def curation_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    prob = F.least(F.lit(1.0), F.col("n_chars") / 400.0)
    return text.deterministic_sample(docs, "doc_id", prob, salt="ds").select(
        "doc_id", "n_chars"
    )


@_q(
    "curation_source_mix",
    """
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    m AS (SELECT min(n) AS mn FROM c),
    r AS (SELECT source, least(1.0, (SELECT mn * 1.0 FROM m) / n) AS rate
          FROM c)
    SELECT doc_id, source
    FROM documents d JOIN r USING (source)
    WHERE (((CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
             AS BIGINT) % 1000000) + 1000000) % 1000000) / 1000000.0 < rate
    """,
    doc="Data mixing: re-balance the corpus to equal shares per source — "
    "per-source acceptance rates from one tiny count aggregate (the "
    "binding source keeps 100%), then the deterministic hash filter at "
    "scan speed; the corpus never shuffles",
)
def curation_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.mix_sources(docs, "source", "doc_id", salt="mix").select(
        "doc_id", "source"
    )


@_q(
    "dedup_cluster_incremental",
    CATALOG["dedup_cluster_components"].oracle,  # IDENTICAL final labels
    doc="Incremental clustering maintenance: cluster the first 60% of the "
    "corpus, then fold the remaining docs' pairs in via star contraction "
    "of the existing clusters (incremental_connected_components) — "
    "propagation cost independent of historical pair count. The oracle is "
    "the SAME full recursive-CTE closure as dedup_cluster_components: "
    "incremental == full recompute, hash-checked",
)
def dedup_cluster_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "blk",
        F.concat_ws(
            "|",
            "lang",
            "source",
            F.floor(
                F.log2(F.size(F.split(F.trim("text"), r"\s+")))
            ).cast("long").cast("string"),
        ),
    )
    split_at = F.lit(300)
    old_docs = docs.filter(F.col("doc_id") < split_at)

    def pairs_of(frame):
        p = dedup.ngram_jaccard_pairs(
            frame, "doc_id", "text", "blk", n=3, min_jaccard=0.0
        )
        return p.withColumn("jaccard", F.round("jaccard", 4)).filter(
            F.col("jaccard") >= 0.1
        )

    base = dedup.connected_components(
        pairs_of(old_docs), "a_id", "b_id",
        all_nodes=old_docs.select("doc_id"), node_col="doc_id",
    )
    # the new batch's pairs: everything the full pair set adds beyond the
    # old-corpus pairs (at least one endpoint in the new docs)
    new_pairs = pairs_of(docs).filter(
        (F.col("a_id") >= split_at) | (F.col("b_id") >= split_at)
    )
    return dedup.incremental_connected_components(
        base, new_pairs, "a_id", "b_id",
        new_nodes=docs.select("doc_id"), node_col="doc_id",
    )


@_q(
    "pack_training_sequences",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents)
    SELECT doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_offset,
           CAST((coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                // 512 AS BIGINT) AS bin_id,
           ((coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + n_tokens - 1) // 512)
           > ((coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
              // 512) AS crosses_boundary
    FROM t
    """,
    doc="Sequence packing for training windows (concat-then-chunk): docs "
    "laid end-to-end in id order, sliced into 512-token bins; per-doc "
    "start offset, bin id, boundary-crossing flag. The global running sum "
    "is the two-phase distributed index — the only partition-less window "
    "runs over the tiny per-bucket table, never the data",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", text.whitespace_token_count("text").cast("long").alias("n_tokens")
    )
    return text.pack_sequences(docs, "doc_id", "n_tokens", capacity=512)


@_q(
    "mm_frame_sample",
    """
    WITH a AS (
      SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS asset_id,
             'audio' AS kind,
             n_chars / 100.0 AS duration_s
      FROM documents),
    n AS (SELECT asset_id, kind,
                 greatest(CAST(floor(duration_s / 1.0) AS INTEGER), 1) AS nf
          FROM a)
    SELECT asset_id, kind,
           CAST(i AS INTEGER) AS frame_idx,
           round(i * 1.0, 3) AS frame_ts
    FROM n, unnest(generate_series(0, nf - 1)) AS t(i)
    """,
    doc="Media frame/window sampling plan: one row per (asset, frame_ts) at "
    "1 s spacing from the duration metadata — posexplode of a generated "
    "sequence, decode-free (the real decoder plugs into extract_features). "
    "Short assets yield exactly one frame",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import multimodal

    assets = _doc_assets(spark, sf_dir)
    return multimodal.frame_sample_plan(assets, every_s=1.0).select(
        "asset_id",
        "kind",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        "frame_ts",
    )


@_q(
    "mm_resize",
    """
    WITH a AS (
      SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS asset_id,
             CAST(200 + doc_id % 1800 AS INTEGER) AS width,
             CAST(150 + (doc_id * 7) % 1200 AS INTEGER) AS height
      FROM documents)
    SELECT asset_id, width, height,
           CAST(ceil(width * least(512.0 / greatest(width, height), 1.0))
                AS INTEGER) AS target_width,
           CAST(ceil(height * least(512.0 / greatest(width, height), 1.0))
                AS INTEGER) AS target_height
    FROM a
    """,
    doc="Image resize plan: aspect-preserving target dimensions capped at "
    "512 px, never upscaling — pure column math over synthesized image "
    "metadata (the pixel work happens in the injected decoder)",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    assets = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("asset_id"),
        (200 + F.col("doc_id") % 1800).cast("int").alias("width"),
        (150 + (F.col("doc_id") * 7) % 1200).cast("int").alias("height"),
    )
    return multimodal.resize_plan(assets, max_side=512)


@_q(
    "text_gopher_rules",
    """
    WITH feats AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS w,
             length(text) - length(replace(text, '#', '')) AS hash_cnt,
             (length(text) - length(replace(text, '...', ''))) / 3 AS ell_cnt,
             text
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             round(list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w), 4)
               AS mean_word_len,
             round(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                   * 1.0 / len(w), 4) AS frac_alpha_words,
             round((hash_cnt + ell_cnt) * 1.0 / len(w), 4) AS symbol_ratio,
             CAST(len(list_filter(['the','a','and','of','to','in','is','for'],
                                  s -> list_contains(w, s))) AS BIGINT)
               AS stop_hits
      FROM feats
    )
    SELECT *,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND frac_alpha_words >= 0.8
            AND symbol_ratio < 0.1
            AND stop_hits >= 2) AS gopher_pass
    FROM m
    """,
    doc=(
        "Gopher quality rule set (Rae et al. 2021 A1.1.2): word-count "
        "bounds, mean word length, alpha-word fraction, symbol ratio, "
        "stopword presence — pure Catalyst HOFs, per-row at scan speed."
    ),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.gopher_rules(docs, "doc_id", "text")


@_q(
    "dedup_spans_firstwins",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), spans AS (
      SELECT doc_id, i AS pos,
             array_to_string(w[(i*5+1):(i*5+5)], ' ') AS span
      FROM words, unnest(range(CAST(ceil(len(w) / 5.0) AS BIGINT))) AS t(i)
    ), ranked AS (
      SELECT doc_id, pos, span,
             row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
      FROM spans
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
                               ORDER BY pos), '') AS dedup_text
    FROM ranked GROUP BY doc_id
    """,
    doc=(
        "C4-style global span dedup (first occurrence wins, 5-word spans): "
        "one shuffle by span for first-wins row_number, one by doc to "
        "reassemble — the exact-substring analog of the MinHash pipeline."
    ),
)
def dedup_spans_firstwins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.span_dedup(docs, "doc_id", "text", span_words=5)


@_q(
    "text_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
    ), vocab AS (
      SELECT w, count(*) AS cnt FROM tok GROUP BY w
    ), tot AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM vocab
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(CAST(round(-ln(cnt / t) * 1000000) AS BIGINT))
                 / (1000000.0 * count(*)), 4) AS avg_nll
    FROM tok JOIN vocab USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc=(
        "Unigram LM scoring: corpus-learned word log-probs, per-doc mean "
        "negative log-likelihood (the cheap perplexity proxy used for "
        "quality filtering, e.g. CCNet). Vocab is Zipf-bounded so it "
        "broadcasts; the corpus shuffles only for the per-doc mean. "
        "Per-token NLL snapped to a 1e-6 grid and summed as int64 so the "
        "mean is order-independent (see _ssum)."
    ),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    vocab = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    total = float(vocab.agg(F.sum("cnt")).collect()[0][0])
    scored = tok.join(F.broadcast(vocab), "w")
    nll_grid = F.round(
        -F.log(F.col("cnt") / F.lit(total)) * 1_000_000
    ).cast("long")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(
            F.sum(nll_grid) / (F.lit(1_000_000.0) * F.count("*")), 4
        ).alias("avg_nll"),
    )


@_q(
    "curation_weighted_sample",
    """
    WITH scored AS (
      SELECT doc_id, n_chars,
             ln((CAST('0x' || substr(md5(concat('s11:',
                    CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT) + 1)
                / 1152921504606846976.0) / n_chars AS es_key
      FROM documents
    )
    SELECT doc_id, n_chars FROM scored
    ORDER BY es_key DESC, doc_id LIMIT 100
    """,
    doc=(
        "Weighted sampling without replacement (Efraimidis-Spirakis A-ES): "
        "key = ln(u)/weight, top-k by key. u comes from the cross-engine "
        "md5 hash so the sample is reproducible; the plan is "
        "TakeOrderedAndProject (per-partition heaps), not a global sort."
    ),
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return text.weighted_sample(docs, "doc_id", "n_chars", k=100, seed=11)


@_q(
    "skew_salted_join",
    """
    SELECT concat('flag_', l_returnflag) AS flag_label,
           round(sum(CAST(round(l_extendedprice * 10000) AS BIGINT))
                 / 10000.0, 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
    doc=(
        "Salted broadcast join under extreme key skew (3 distinct keys over "
        "the whole fact table): the dim replicates across 16 salt ids so a "
        "hot key spreads over 16 tasks; result must equal the unsalted "
        "join + group-by exactly."
    ),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import skew

    li = _t(spark, sf_dir, "lineitem")
    dim = (
        li.select("l_returnflag")
        .distinct()
        .withColumn("flag_label", F.concat(F.lit("flag_"), F.col("l_returnflag")))
    )
    joined = skew.salted_broadcast_join(li, dim, "l_returnflag")
    return joined.groupBy("flag_label").agg(
        _ssum("l_extendedprice", 2).alias("revenue"),
        F.count("*").alias("n"),
    )


def _zorder_oracle() -> str:
    from lakehouse_spark.operators.layout import interleave_bits_sql

    z = interleave_bits_sql("l_partkey % 256", "l_suppkey % 256", 8)
    return f"""
    SELECT l_orderkey, l_linenumber, {z} AS zkey
    FROM lineitem
    ORDER BY zkey, l_orderkey, l_linenumber LIMIT 50
    """


@_q(
    "layout_zorder_key",
    _zorder_oracle(),
    doc=(
        "Z-order (Morton) clustering key: bit-interleave of two dimension "
        "keys, verified bit-for-bit against the DuckDB rendering. The "
        "write path (operators/layout.write_zordered) range-partitions by "
        "this key so 2-D box predicates prune files on both dimensions — "
        "pruning gain is asserted from parquet footer stats in "
        "tests/test_layout_zorder.py."
    ),
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators.layout import interleave_bits

    li = _t(spark, sf_dir, "lineitem")
    z = interleave_bits(F.col("l_partkey") % 256, F.col("l_suppkey") % 256, 8)
    return (
        li.select("l_orderkey", "l_linenumber", z.alias("zkey"))
        .orderBy("zkey", "l_orderkey", "l_linenumber")
        .limit(50)
    )


@_q(
    "search_keyword_and",
    """
    SELECT doc_id FROM documents
    WHERE list_contains(regexp_split_to_array(lower(trim(text)), '\\s+'), 'spark')
      AND list_contains(regexp_split_to_array(lower(trim(text)), '\\s+'), 'window')
      AND list_contains(regexp_split_to_array(lower(trim(text)), '\\s+'), 'merge')
    """,
    doc=(
        "Keyword AND-search through the inverted-index plan (posting "
        "filter + distinct-term count per doc) — must return exactly the "
        "full-scan answer. The persisted/maintained index variant "
        "(InvertedIndex over TableStore) is pytest-covered; cost is "
        "O(matched postings), not O(corpus)."
    ),
)
def search_keyword_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_spark.operators import search

    docs = _t(spark, sf_dir, "documents")
    idx = search.postings(docs, "doc_id", "text")
    return search.and_search(idx, ["spark", "window", "merge"])


@_q(
    "dedup_fuzzy_levenshtein",
    """
    WITH p AS (
      SELECT p_partkey, p_name,
             split_part(p_name, ' ', -1) || '|' || substr(p_name, 1, 1) AS block
      FROM part
    )
    SELECT a.block,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
           CAST(min(CASE WHEN a.p_name <> b.p_name
                         THEN levenshtein(a.p_name, b.p_name) END) AS BIGINT)
             AS min_nonzero_dist
    FROM p a JOIN p b
      ON a.block = b.block AND a.p_partkey < b.p_partkey
    GROUP BY a.block
    """,
    doc=(
        "Fuzzy string matching: blocked Levenshtein self-join, aggregated "
        "to per-block near-match stats. Block = (head noun, first char): "
        "at dist<=2 the adjectives almost always share an initial; a "
        "noun-only block squares 2k-row groups into 20M pairs (38s at "
        "sf0.1), the two-key block is ~3.5s with the pair space O(sum "
        "block^2). Production recall adds a second blocking pass on "
        "another key (multi-pass blocking), same plan shape."
    ),
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.concat(
            F.element_at(F.split("p_name", " "), -1),
            F.lit("|"),
            F.substring("p_name", 1, 1),
        ).alias("block"),
    )
    a = p.alias("a")
    b = p.alias("b")
    joined = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    )
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return joined.groupBy(F.col("a.block").alias("block")).agg(
        F.count("*").alias("n_pairs"),
        F.sum((dist <= 2).cast("long")).alias("n_near"),
        F.min(
            F.when(F.col("a.p_name") != F.col("b.p_name"), dist)
        ).cast("long").alias("min_nonzero_dist"),
    )


def _rp_lsh_oracle(k: int = 16, bands: int = 2, min_cos: float = 0.3) -> str:
    from lakehouse_spark.operators.dedup import hyperplanes

    planes = hyperplanes(k, 64)
    sig_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {planes[p]!r}) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(k)
    )
    width = k // bands
    mask = (1 << width) - 1
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, v, {b} AS band, (sig >> {b * width}) & {mask} AS bits "
        "FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (SELECT vec_id, v, CAST({sig_terms} AS BIGINT) AS sig FROM e),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bits = b.bits AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, cosine FROM (
      SELECT c.a_id, c.b_id,
             round(list_dot_product(ea.v, eb.v)
                   / (sqrt(list_dot_product(ea.v, ea.v))
                      * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
      FROM cand c
      JOIN e ea ON ea.vec_id = c.a_id
      JOIN e eb ON eb.vec_id = c.b_id)
    WHERE cosine >= {min_cos}
    """


@_q(
    "dedup_embedding_rplsh",
    _rp_lsh_oracle(),
    doc=(
        "Random-hyperplane LSH near-dup (Charikar SimHash for vectors): "
        "16-bit sign signature from md5-derived hyperplanes, 2x8-bit "
        "banded equi self-join, exact-cosine verify of candidates only. "
        "The no-blocking-column ANN path — the hash IS the blocking."
    ),
)
def dedup_embedding_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    return dedup.rp_lsh_near_duplicates(emb, "vec_id", "v")


@_q(
    "text_char_entropy",
    """
    WITH c AS (
      SELECT doc_id, regexp_split_to_array(text, '') AS cs FROM documents
    )
    SELECT doc_id,
           CAST(len(cs) AS BIGINT) AS n_chars,
           round(-list_sum(list_transform(list_distinct(cs),
               ch -> CAST(round(
                 (len(list_filter(cs, x -> x = ch)) * 1.0 / len(cs))
                 * log2(len(list_filter(cs, x -> x = ch)) * 1.0 / len(cs))
                 * 100000000) AS BIGINT)))
             / 100000000.0, 4) AS entropy_bits
    FROM c
    """,
    doc=(
        "Character-level Shannon entropy per document (compressibility "
        "quality signal: gibberish and boilerplate sit at the extremes). "
        "Pure per-row HOFs — distinct chars x length work per row, no "
        "explode, no shuffle, scan speed. Each p*log2(p) term snaps to a "
        "1e-8 grid and sums as int64 so the fold order (which differs "
        "between engines' distinct implementations) cannot move the hash."
    ),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explode + two-phase aggregate instead of per-row HOF folds: the HOF
    # form is O(distinct x len) of INTERPRETED lambda calls per row (7.7 s
    # at sf0.1); exploding stays in whole-stage codegen and the map-side
    # partial combine shrinks the shuffle to ~30 (doc, char) rows per doc
    # (0.9 s, identical hash — the int-grid sum is order-independent).
    docs = _t(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id")
    n = F.sum("cnt").over(w)
    p = F.col("cnt") * F.lit(1.0) / n
    term = F.round(p * F.log2(p) * 100_000_000).cast("long")
    return (
        counts.withColumn("n", n)
        .withColumn("term", term)
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_chars"),
            F.round(-F.sum("term") / F.lit(100_000_000.0), 4).alias(
                "entropy_bits"
            ),
        )
    )


@_q(
    "curation_contamination_matrix",
    """
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 4),
               i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')
             )) AS gram
      FROM documents),
    bench AS (
      SELECT 'holdout_a' AS benchmark, gram FROM grams WHERE doc_id % 97 = 0
      UNION
      SELECT 'holdout_b', gram FROM grams WHERE doc_id % 89 = 1
    ),
    members AS (
      SELECT 'holdout_a' AS benchmark, doc_id FROM documents WHERE doc_id % 97 = 0
      UNION ALL
      SELECT 'holdout_b', doc_id FROM documents WHERE doc_id % 89 = 1
    ),
    hits AS (
      SELECT DISTINCT b.benchmark, g.doc_id
      FROM grams g JOIN bench b USING (gram)
      WHERE NOT EXISTS (SELECT 1 FROM members m
                        WHERE m.benchmark = b.benchmark
                          AND m.doc_id = g.doc_id)
    )
    SELECT benchmark,
           CAST(count(*) AS BIGINT) AS n_contaminated,
           round(count(*) * 1.0 / (SELECT count(*) FROM documents), 6) AS rate
    FROM hits GROUP BY benchmark
    """,
    doc=(
        "Contamination matrix across MULTIPLE benchmarks in one pass: all "
        "benchmark 5-gram sets union into one tagged broadcast side, the "
        "training corpus's grams join it ONCE (vs one scan per benchmark), "
        "benchmark members excluded via the tagged anti condition. Per-"
        "benchmark contaminated counts + rates."
    ),
)
def curation_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(text.word_ngrams(F.col("text"), 5)).alias("gram")
    )
    benches = [
        ("holdout_a", F.col("doc_id") % 97 == 0),
        ("holdout_b", F.col("doc_id") % 89 == 1),
    ]
    bench_grams = None
    members = None
    for name, cond in benches:
        bg = grams.filter(cond).select(
            F.lit(name).alias("benchmark"), "gram"
        ).distinct()
        mb = docs.filter(cond).select(F.lit(name).alias("benchmark"), "doc_id")
        bench_grams = bg if bench_grams is None else bench_grams.unionByName(bg)
        members = mb if members is None else members.unionByName(mb)
    hits = (
        grams.join(F.broadcast(bench_grams), "gram")
        .select("benchmark", "doc_id")
        .dropDuplicates(["benchmark", "doc_id"])
        .join(F.broadcast(members), ["benchmark", "doc_id"], "left_anti")
    )
    n_docs = docs.count()
    return hits.groupBy("benchmark").agg(
        F.count("*").alias("n_contaminated"),
        F.round(F.count("*") / F.lit(float(n_docs)), 6).alias("rate"),
    )


@_q(
    "sim_topk_filtered",
    """
    WITH q AS (SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS cv
               FROM embeddings)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                   6) AS cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
               neighbor_id) AS INTEGER) AS rank
      FROM q JOIN c ON neighbor_id <> query_id AND q.label = c.label) t
    WHERE rank <= 5
    """,
    doc=(
        "Filtered ANN (metadata predicate INSIDE the search): top-k cosine "
        "restricted to corpus rows sharing the query's label. The filter "
        "rides the join condition, so pruning happens before any distance "
        "is computed — post-filtering a plain top-k instead would return "
        "fewer than k hits whenever the filter is selective."
    ),
)
def sim_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_spark.operators.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), "label", F.col("embedding").alias("cv")
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("label") == F.col("q_label")),
    ).withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@_q(
    "search_hybrid_rrf",
    """
    WITH d AS (
      SELECT doc_id, list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS toks
      FROM documents
    ), e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
      SELECT d.doc_id AS query_id, d.toks AS qt, e.v AS qv
      FROM d JOIN e ON e.vec_id = d.doc_id WHERE d.doc_id < 3
    ), kw AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY len(list_intersect(qt, toks)) DESC, doc_id) AS INTEGER)
               AS rank_kw
      FROM q JOIN d ON d.doc_id <> q.query_id
      QUALIFY rank_kw <= 50
    ), vec AS (
      SELECT query_id, vec_id AS doc_id,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) DESC,
               vec_id) AS INTEGER) AS rank_vec
      FROM q JOIN e ON e.vec_id <> q.query_id
      QUALIFY rank_vec <= 50
    ), fused AS (
      SELECT coalesce(kw.query_id, vec.query_id) AS query_id,
             coalesce(kw.doc_id, vec.doc_id) AS doc_id,
             round(coalesce(1.0 / (60 + rank_kw), 0)
                   + coalesce(1.0 / (60 + rank_vec), 0), 6) AS rrf
      FROM kw FULL OUTER JOIN vec
        ON kw.query_id = vec.query_id AND kw.doc_id = vec.doc_id
    )
    SELECT query_id, doc_id, rrf,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank
    FROM fused
    QUALIFY rank <= 10
    """,
    doc=(
        "Hybrid search with Reciprocal Rank Fusion: keyword ranking "
        "(distinct-token overlap) and vector ranking (exact cosine) each "
        "produce a top-50, fused by 1/(60+rank) sums, top-10 emitted. Both "
        "arms broadcast only the 3 queries; the corpus is scanned once per "
        "modality and never shuffled — the lexical arm runs over the same "
        "posting representation the inverted index persists."
    ),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_spark.operators.similarity import cosine

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(
            F.split(F.lower(F.trim("text")), r"\s+")
        ).alias("toks"),
    )
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    )
    q = (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .filter(F.col("doc_id") < 3)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("toks").alias("qt"),
            F.col("v").alias("qv"),
        )
    )
    w_kw = Window.partitionBy("query_id").orderBy(
        F.desc("overlap"), F.asc("doc_id")
    )
    kw = (
        docs.join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .withColumn("overlap", F.size(F.array_intersect("qt", "toks")))
        .withColumn("rank_kw", F.row_number().over(w_kw))
        .filter(F.col("rank_kw") <= 50)
        .select("query_id", "doc_id", "rank_kw")
    )
    w_vec = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("doc_id")
    )
    vec = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("v")), 6))
        .withColumn("doc_id", F.col("vec_id"))
        .withColumn("rank_vec", F.row_number().over(w_vec))
        .filter(F.col("rank_vec") <= 50)
        .select("query_id", "doc_id", "rank_vec")
    )
    fused = kw.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.round(
            F.coalesce(1.0 / (60 + F.col("rank_kw")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= 10)
    )


@_q(
    "curation_url_normalize",
    """
    WITH u AS (
      SELECT doc_id,
             'HTTP://Example.COM:80/Docs/' || CAST(doc_id % 50 AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0 THEN '/?b=2&a=1#frag'
                       WHEN doc_id % 3 = 1 THEN '?a=1&b=2'
                       ELSE '/' END AS url
      FROM documents
    ), n AS (
      SELECT doc_id, url,
             CASE WHEN q = '' THEN base
                  ELSE base || '?' || array_to_string(list_sort(string_split(q, '&')), '&')
             END AS canonical
      FROM (
        SELECT doc_id, url,
               regexp_extract(np, '^([^?]*?)/?(?:\\?.*)?$', 1) AS base,
               regexp_extract(np, '\\?(.*)$', 1) AS q
        FROM (
          SELECT doc_id, url,
                 regexp_replace(
                   lower(regexp_extract(nf, '^([a-zA-Z]+://[^/?]*)', 1))
                     || regexp_replace(nf, '^[a-zA-Z]+://[^/?]*', ''),
                   '^(https?://[^/:?]*):(?:80|443)([/?]|$)', '\\1\\2') AS np
          FROM (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nf
                FROM u) t1) t2) t3
    )
    SELECT canonical,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM n GROUP BY canonical
    """,
    doc=(
        "URL canonicalization for web-corpus dedup: lowercase scheme+host, "
        "strip default port/fragment/trailing slash, sort query params — "
        "then the exact-dedup groupBy. Mirror forms (case, param order, "
        "trailing slash) collapse to one canonical key on both engines."
    ),
)
def curation_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTP://Example.COM:80/Docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/?b=2&a=1#frag"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit("/")),
    )
    u = docs.select("doc_id", url.alias("url"))
    return (
        u.withColumn("canonical", text.normalize_url("url"))
        .groupBy("canonical")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def _minhash_cross_oracle(k: int = 16, bands: int = 4, min_j: float = 0.5) -> str:
    from lakehouse_spark.operators.dedup import xor_salts

    rows = k // bands
    sig_exprs = ",\n             ".join(
        f"list_min(list_transform(hs, h -> xor(h, {salt}))) AS m{j}"
        for j, salt in enumerate(xor_salts(k))
    )
    band_rows = ", ".join(
        "({b}, [{ms}])".format(
            b=b, ms=", ".join(f"m{b * rows + i}" for i in range(rows))
        )
        for b in range(bands)
    )
    return f"""
    WITH words AS (
      SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
      FROM words WHERE len(w) >= 3
    ), sig AS (
      SELECT id, sh,
             {sig_exprs}
      FROM (SELECT id, sh,
                   list_transform(sh, s -> {_hash64_sql('s')}) AS hs
            FROM base)
    ), banded AS (
      SELECT id, b.band, b.band_sig
      FROM sig, LATERAL (VALUES {band_rows}) AS b(band, band_sig)
    ), pairs AS (
      SELECT DISTINCT e.id AS existing_id, i.id AS incoming_id
      FROM banded e JOIN banded i
        ON e.band = i.band AND e.band_sig = i.band_sig
      WHERE e.id < 400 AND i.id >= 400
    )
    SELECT existing_id, incoming_id, jaccard FROM (
      SELECT p.existing_id, p.incoming_id,
             round(len(list_intersect(x.sh, y.sh)) * 1.0 /
                   len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
      FROM pairs p
      JOIN base x ON x.id = p.existing_id
      JOIN base y ON y.id = p.incoming_id) v
    WHERE jaccard >= {min_j}
    """


@_q(
    "dedup_minhash_incoming",
    _minhash_cross_oracle(),
    doc=(
        "Cross-corpus MinHash-LSH (incremental ingest, batch face): which "
        "incoming documents (doc_id >= 400) near-duplicate the existing "
        "corpus (doc_id < 400). The existing side's band relation is the "
        "reusable index; the candidate join is banded existing x incoming, "
        "never existing-squared."
    ),
)
def dedup_minhash_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = dedup.minhash_cross_corpus(
        docs.filter(F.col("doc_id") < 400),
        docs.filter(F.col("doc_id") >= 400),
        "doc_id",
        "text",
        min_jaccard=0.0,
    )
    return out.withColumn("jaccard", F.round("jaccard", 4)).filter(
        F.col("jaccard") >= 0.5
    )


@_q(
    "curation_decontaminate_bloom",
    """
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 4),
               i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')
             )) AS gram
      FROM documents),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 5),
    hits AS (SELECT DISTINCT doc_id FROM grams
             WHERE gram IN (SELECT gram FROM bench))
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
    doc=(
        "Bloom-prescreened decontamination: a 16 KiB bit-array literal "
        "replaces broadcasting the full benchmark gram set (the thing that "
        "stops fitting at 100 TB); survivors verify against the exact set. "
        "No false negatives + exact verify = byte-identical to the plain "
        "semi-join decontamination — the oracle IS the plain form."
    ),
)
def curation_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    return text.bloom_decontaminate(docs, bench, "doc_id", "text", n=5)


def _simhash_pairs_oracle(bits: int = 60, max_hamming: int = 3) -> str:
    votes = ",\n             ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = ", ".join(str(b) for b in range(n_bands))
    return f"""
    WITH tok AS (
      SELECT doc_id AS id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
      FROM documents
    ), h AS (
      SELECT id, {_hash64_sql('t')} AS h FROM tok
    ), votes AS (
      SELECT id, {votes} FROM h GROUP BY id
    ), sigs AS (
      SELECT id, CAST({fingerprint} AS BIGINT) AS sh FROM votes
    ), banded AS (
      SELECT id, sh, b AS band, (sh >> (b * {band_bits})) & {mask} AS band_val
      FROM sigs, unnest([{bands}]) AS u(b)
    )
    SELECT DISTINCT a.id AS a_id, b.id AS b_id,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id
    WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


@_q(
    "dedup_simhash_pairs",
    _simhash_pairs_oracle(),
    doc=(
        "SimHash near-dup PAIRS with pigeonhole-complete banding: any pair "
        "within Hamming distance 3 must agree on one of 4 full 15-bit "
        "bands, so the banded equi self-join has ZERO recall loss (unlike "
        "probabilistic MinHash banding); candidates verify with "
        "bit_count(xor). Complements the fingerprint entry dedup_simhash."
    ),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = dedup.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3)
    return out.withColumn("hamming", F.col("hamming").cast("long"))


@_q(
    "pii_redaction_extended",
    r"""
    WITH synth AS (
      SELECT doc_id,
             text ||
             (CASE WHEN doc_id % 2 = 0
                   THEN ' card 4111-1111-1111-1111 used' ELSE '' END) ||
             (CASE WHEN doc_id % 3 = 0
                   THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.7 host' ELSE '' END) ||
             (CASE WHEN doc_id % 7 = 0 THEN ' build v1.2.3 tag' ELSE '' END)
               AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '\b\d{4}[- ]\d{4}[- ]\d{4}(?:[- ]\d{4})?\b')) AS INTEGER)
             AS n_card,
           CAST(len(regexp_extract_all(t,
             '\b(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}\b'))
             AS INTEGER) AS n_ipv4,
           sha256(
             regexp_replace(
               regexp_replace(t,
                 '\b\d{4}[- ]\d{4}[- ]\d{4}(?:[- ]\d{4})?\b', '[CARD]', 'g'),
               '\b(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}\b',
               '[IPV4]', 'g')
           ) AS redacted_fp
    FROM synth
    """,
    doc=(
        "Extended PII pass: payment-card and IPv4 detectors (octet-bounded "
        "so 'v1.2.3' version strings don't false-positive) over synthesized "
        "contact strings, counts + redaction fingerprint — same RE2-safe "
        "chained-replace shape as the core pii_redaction entry."
    ),
)
def pii_redaction_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" card 4111-1111-1111-1111 used")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" from 192.168."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7 host"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" build v1.2.3 tag")).otherwise(
                F.lit("")
            ),
        ).alias("t"),
    )
    counts = text.pii_counts("t", text.PII_PATTERNS_EXTENDED)
    red = text.redact_pii(
        "t", text.PII_PATTERNS_EXTENDED, ("card", "ipv4")
    )
    return synth.select(
        "doc_id",
        counts["card"].alias("n_card"),
        counts["ipv4"].alias("n_ipv4"),
        F.sha2(red, 256).alias("redacted_fp"),
    )


@_q(
    "text_bigram_logprob",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), bg AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM words, unnest(range(1, len(w))) AS t(i)
      WHERE len(w) >= 2
    ), c12 AS (
      SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, count(*) AS n1 FROM bg GROUP BY w1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(CAST(round(-ln(n12 * 1.0 / n1) * 1000000) AS BIGINT))
                 / (1000000.0 * count(*)), 4) AS avg_bigram_nll
    FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
    GROUP BY doc_id
    """,
    doc=(
        "Bigram LM scoring: corpus-learned conditional probabilities "
        "p(w2|w1) = c(w1,w2)/c(w1), per-doc mean NLL on the 1e-6 int grid "
        "(order-independent, see text_unigram_logprob). Both count tables "
        "are Zipf-bounded and broadcast; the corpus shuffles once for the "
        "per-doc mean — the natural next rung above the unigram proxy."
    ),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w1"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = tok.withColumn("w2", F.lead("w1").over(w)).filter(
        F.col("w2").isNotNull()
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("n1"))
    scored = bg.join(F.broadcast(c12), ["w1", "w2"]).join(
        F.broadcast(c1), "w1"
    )
    nll = F.round(
        -F.log(F.col("n12") * F.lit(1.0) / F.col("n1")) * 1_000_000
    ).cast("long")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum(nll) / (F.lit(1_000_000.0) * F.count("*")), 4).alias(
            "avg_bigram_nll"
        ),
    )
