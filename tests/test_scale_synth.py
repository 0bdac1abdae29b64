"""plans/scale_synth: the synthesized K× dataset must scale every
measured quantity LINEARLY, or the bench's 100×-span scaling section
would blame plans for artifacts the data manufactured.

Invariants:
- fact tables grow exactly K×; fixed dims (region/nation) stay 1×;
- keys shift in lockstep, so join fan-out is exactly K× (no cross-copy
  matches, no dropped matches);
- the per-copy token bijection keeps within-copy document similarity
  identical while cross-copy shingle overlap is zero — near-dup pair
  mass grows K×, never K²;
- copy 0 is verbatim, so pinned probe literals (vec_id < 10 query sets,
  decontamination bench sets) still hit real rows;
- rebuilds are cached (marker match short-circuits).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakehouse_spark.io import load_table
from lakehouse_spark.plans.scale_synth import synthesize_scaled

SRC = "/root/testdata/sf0.001"
K = 3


def _synth(spark, tmp_path) -> str:
    return synthesize_scaled(
        spark, SRC, k=K, dst_dir=str(tmp_path / "scaled")
    )


def test_counts_scale_k_dims_stay_fixed(spark, tmp_path):
    d = _synth(spark, tmp_path)
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        assert (
            load_table(spark, d, t).count()
            == K * load_table(spark, SRC, t).count()
        ), t
    for t in ("region", "nation"):
        assert (
            load_table(spark, d, t).count()
            == load_table(spark, SRC, t).count()
        ), t


def test_join_fanout_exactly_k(spark, tmp_path):
    d = _synth(spark, tmp_path)

    def fanout(base):
        o = load_table(spark, base, "orders")
        li = load_table(spark, base, "lineitem")
        return li.join(o, li.l_orderkey == o.o_orderkey).count()

    assert fanout(d) == K * fanout(SRC)


def test_copy0_verbatim_and_keys_disjoint(spark, tmp_path):
    d = _synth(spark, tmp_path)
    src_docs = load_table(spark, SRC, "documents")
    out_docs = load_table(spark, d, "documents")
    n = src_docs.count()
    # copy 0 rows are byte-identical (exceptAll empty both ways)
    c0 = out_docs.join(src_docs.select("doc_id"), "doc_id", "semi")
    assert c0.count() == n
    assert c0.exceptAll(src_docs).count() == 0
    # ids never collide across copies
    assert out_docs.select("doc_id").distinct().count() == K * n


def test_cross_copy_token_overlap_is_zero(spark, tmp_path):
    d = _synth(spark, tmp_path)
    src_docs = load_table(spark, SRC, "documents")
    n = src_docs.count()
    out_docs = load_table(spark, d, "documents")
    toks = out_docs.select(
        (F.col("doc_id") / n).cast("int").alias("copy"),
        F.explode(F.split("text", r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    # a token appearing in two copies would let near-dup mass grow
    # super-linearly; the suffix bijection must keep vocabularies disjoint
    assert (
        toks.groupBy("tok")
        .agg(F.countDistinct("copy").alias("nc"))
        .filter("nc > 1")
        .count()
        == 0
    )


def test_rebuild_is_cached(spark, tmp_path):
    d = _synth(spark, tmp_path)
    marker = os.path.join(d, "_SYNTH_OK")
    stamp = os.path.getmtime(marker)
    assert _synth(spark, tmp_path) == d
    assert os.path.getmtime(marker) == stamp  # untouched: short-circuited
