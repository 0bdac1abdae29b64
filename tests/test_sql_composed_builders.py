"""Round-13 continuation: the hot query constructors compose Spark-SQL
strings (one expr()/selectExpr parse) instead of Column-DSL chains — one
py4j round-trip per F.* call measured ~0.5-1 ms on a virtualized driver and
query CONSTRUCTION was ~45% of the headline suite. These tests pin that the
string composers build the SAME values as the Column forms they replaced,
and that the io-layer schema memo never changes what a read returns.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lakehouse_spark.functions.scalar import hash64, hash64_spark_sql


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "one two"),  # fewer words than n=3 → no grams
            (4, ""),
            (5, "repeat repeat repeat repeat repeat"),
        ],
        "doc_id long, text string",
    )


def test_hash64_spark_sql_matches_column_form(spark, docs):
    for mode in ("md5", "xxhash64"):
        for seed in (0, 7):
            got = docs.selectExpr(
                "doc_id",
                f"{hash64_spark_sql('text', seed=seed, mode=mode)} as h",
            ).collect()
            want = docs.select(
                "doc_id", hash64("text", seed=seed, mode=mode).alias("h")
            ).collect()
            assert sorted(got) == sorted(want), (mode, seed)


def test_hash64_spark_sql_rejects_unknown_mode():
    with pytest.raises(ValueError):
        hash64_spark_sql("x", mode="fnv")


def test_word_ngrams_sql_matches_column_form(spark, docs):
    from lakehouse_spark.operators.text import word_ngrams, word_ngrams_sql

    for n in (2, 3, 5):
        got = docs.selectExpr(
            "doc_id", f"{word_ngrams_sql('text', n)} as g"
        ).collect()
        # Column-input path still uses the DSL fold — compare against it.
        want = docs.select(
            "doc_id", word_ngrams(F.col("text"), n).alias("g")
        ).collect()
        assert sorted(got, key=lambda r: r.doc_id) == sorted(
            want, key=lambda r: r.doc_id
        ), n


def test_minhash_signature_sql_matches_column_form(spark, docs):
    from lakehouse_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_sql,
        shingle_frame,
    )

    sh = shingle_frame(docs, "doc_id", "text", 3, spread_input=False)
    hs = "transform(sh, s -> xxhash64(s) & 1152921504606846975L)"
    got = sh.selectExpr("id", f"{minhash_signature_sql(hs, 16)} as sig").collect()
    want = sh.select(
        "id",
        minhash_signature(
            F.transform("sh", lambda s: hash64(s, mode="xxhash64")), 16
        ).alias("sig"),
    ).collect()
    assert sorted(got) == sorted(want)


def test_pair_tool_events_quoted_kind_values(spark):
    # _sql_str must survive kind values containing quotes/backslashes —
    # they flow into CASE WHEN string literals now.
    from lakehouse_spark.operators.sessionize import pair_tool_events

    ev = spark.createDataFrame(
        [
            ("s1", "it's pre", 1, 10),
            ("s1", 'post"\\', 2, 20),
            ("s1", "it's pre", 3, 30),
        ],
        "sid string, kind string, eid long, ts long",
    )
    out = pair_tool_events(
        ev,
        keys=["sid"],
        kind_col="kind",
        order=[F.asc("ts"), F.asc("eid")],
        pre_kind="it's pre",
        post_kind='post"\\',
        rank_col="rn",
    ).collect()
    assert len(out) == 2
    matched = {r.rn: (r.eid, r.eid_post) for r in out}
    assert matched[1] == (1, 2)  # 1st pre ↔ 1st post
    assert matched[2] == (3, None)  # 2nd pre unmatched


def test_load_table_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    # The memo is keyed on (path, mtime_ns, size): rewriting the table with
    # a DIFFERENT schema must be picked up, not served stale.
    from lakehouse_spark import io as lio

    sfd = str(tmp_path)
    p = os.path.join(sfd, "nation.parquet")
    spark.createDataFrame(
        [(1, "a", 0, "x")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    ).toPandas().to_parquet(p)
    first = lio.load_table(spark, sfd, "nation")
    assert dict(first.dtypes)["n_nationkey"] == "bigint"
    assert lio.load_table(spark, sfd, "nation").schema == first.schema
    # rewrite with a narrower type; bump mtime to defeat same-second stats
    os.remove(p)
    spark.createDataFrame(
        [(1, "a", 0, "x")],
        "n_nationkey int, n_name string, n_regionkey long, n_comment string",
    ).toPandas().to_parquet(p)
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 7))
    again = lio.load_table(spark, sfd, "nation")
    assert dict(again.dtypes)["n_nationkey"] == "int"
