"""Synthesize a K×-scaled copy of a testdata directory for scaling runs.

The driver caps generated testdata at sf0.1, so the measured scaling curve
stops at 10× (sf0.01 → sf0.1) — enough to catch gross pair blowups, but a
quadratic term with a small constant can hide inside 10×. This module
manufactures the third point: a ~K× dataset built as the union of K
KEY-SHIFTED copies of the source tables, giving bench.py a measured
~100× span (sf0.01 → sf0.1 → sf1-ish) instead of an extrapolated one.

Shifting is designed so every headline query's work grows LINEARLY in K —
i.e. the synthetic corpus has K× the rows AND K× the true result mass, so
a super-linear shuffle reading indicts the PLAN, not the data:

- **fact/dim keys shift together** (o_orderkey and l_orderkey by the same
  stride; o_custkey and c_custkey; l_partkey/p_partkey;
  l_suppkey/s_suppkey), so each copy joins only with itself and join
  output is exactly K× the original.
- **region/nation stay single** — TPC-H scaling holds nation count fixed;
  every copy's customers/suppliers still resolve against the one dim.
- **documents get a per-copy token bijection** (every non-space token of
  copy i>0 gains suffix ``i``): a bijective vocabulary rename preserves
  every within-copy shingle-set Jaccard EXACTLY, while cross-copy Jaccard
  drops to ~0 — so near-dup pairs grow K×, not K² (a verbatim copy would
  make every doc a dup of its K-1 clones and the measurement would blame
  the plan for a quadratic the data manufactured). Copy 0 is verbatim, so
  fixed probe literals (decontamination bench sets, vec_id < 10 query
  sets) keep hitting real rows.
- **embeddings/events shift ids only** — query sets are pinned to copy-0
  ids, so ANN scans grow K× on the corpus side with a fixed query side.

The result is cached under /tmp keyed by source dir and K; a marker file
records completion so concurrent/repeated bench runs reuse it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_spark.io import load_table

#: columns shifted per table: {table: [(col, stride_table)]} — stride_table
#: names the table whose key-space size defines the shift stride, so
#: foreign keys move in lockstep with the primary keys they reference.
_SHIFTS: dict[str, list[tuple[str, str]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "events")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

#: the key column whose max defines each table's stride
_STRIDE_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

_DIM_TABLES = ("region", "nation")  # single copy: fixed-size dims
_MARKER = "_SYNTH_OK"


def _strides(spark: SparkSession, src_dir: str) -> dict[str, int]:
    """1 + max(key) per stride table — copies never collide."""
    out: dict[str, int] = {}
    for t, key in _STRIDE_KEY.items():
        mx = load_table(spark, src_dir, t).agg(F.max(key)).first()[0]
        out[t] = int(mx) + 1
    # label stride for the per-copy label shift (see _scaled_copy)
    mx = load_table(spark, src_dir, "embeddings").agg(F.max("label")).first()[0]
    out["embeddings_label"] = int(mx) + 1
    return out


def _scaled_copy(df: DataFrame, table: str, i: int, strides: dict) -> DataFrame:
    if i == 0:
        return df  # copy 0 verbatim: probe literals keep hitting real rows
    for col, stride_table in _SHIFTS[table]:
        df = df.withColumn(
            col, (F.col(col) + F.lit(i * strides[stride_table])).cast("long")
        )
    if table == "documents":
        # Bijective vocabulary rename: suffix every token with the copy id.
        # Preserves within-copy shingle Jaccard exactly; cross-copy ~0.
        df = df.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1{i}")
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "part":
        # Common-suffix rename (round 8): appending the same copy digit to
        # both strings of a pair preserves Levenshtein distance exactly,
        # while making the last-word half of dedup_fuzzy_levenshtein's
        # (head noun, first char) block key copy-distinct — so its
        # fixed-cardinality blocks grow Kx in COUNT, not size, and the
        # blocked pair space stays linear (un-renamed copies measured 24x
        # time on 10x data from the squared blocks).
        df = df.withColumn("p_name", F.concat(F.col("p_name"), F.lit(str(i))))
    if table == "embeddings":
        # Per-copy label shift (round 8): label-blocked operators
        # (sim_knn_graph, dedup_embedding_cosine) compare all pairs
        # WITHIN a label. Un-shifted copies grow each block Kx and the
        # block-internal pair space Kˆ2 — the round-8 stress run measured
        # a 17-23x shuffle on 10x data from exactly this. With the shift,
        # label CARDINALITY grows Kx at constant block size (how real
        # corpora scale: more sources, not monster sources), every copy's
        # k-NN graph equals the original's (shifted), and work grows
        # exactly Kx. Copy-0 labels stay verbatim so pinned query
        # literals keep matching.
        df = df.withColumn(
            "label",
            (F.col("label") + F.lit(i * strides["embeddings_label"])).cast(
                "long"
            ),
        )
    return df


def synthesize_scaled(
    spark: SparkSession, src_dir: str, k: int = 10, dst_dir: str | None = None
) -> str:
    """Build (or reuse) a ~k× key-shifted union of ``src_dir`` and return
    its path. Idempotent: a completed build leaves a marker recording
    (src, k); matching markers short-circuit."""
    src_dir = src_dir.rstrip("/")
    if dst_dir is None:
        dst_dir = os.path.join(
            "/tmp", f"lakehouse_scale{k}_{os.path.basename(src_dir)}"
        )
    marker = os.path.join(dst_dir, _MARKER)
    # "gen" bumps when the synthesis recipe changes (round 8: embedding
    # label rename) so stale /tmp caches rebuild instead of short-circuiting.
    want = {"src": os.path.realpath(src_dir), "k": k, "gen": 3}
    try:
        with open(marker) as f:
            if json.load(f) == want:
                return dst_dir
    except (FileNotFoundError, ValueError):
        pass
    os.makedirs(dst_dir, exist_ok=True)
    strides = _strides(spark, src_dir)
    for table in _SHIFTS:
        df = load_table(spark, src_dir, table)
        if table not in _DIM_TABLES:
            df = df.cache()
            copies = [_scaled_copy(df, table, i, strides) for i in range(k)]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = df
        # one flat parquet dir per table, like the source layout — the
        # loaders take <dir>/<table>.parquet, which may be a directory.
        out.write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{table}.parquet")
        )
        if table not in _DIM_TABLES:
            df.unpersist()
    with open(marker, "w") as f:
        json.dump(want, f)
    return dst_dir
