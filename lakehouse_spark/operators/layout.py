"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional scan pruning.

A single-column sort gives parquet min/max pruning on that column only; a
100 TB fact table filtered on TWO dimensions (e.g. part AND supplier)
prunes almost nothing on the second one. Interleaving the bits of both
keys (the Morton curve) makes rows close in EITHER dimension land close in
the file order, so every file/row-group covers a small rectangle of the
key space and a 2-D box predicate skips most of them — the same technique
behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Two pieces, both pure Catalyst:

- :func:`rank_bucket` maps an arbitrary numeric column to [0, 2^bits)
  using range boundaries from a driver-side sample (``approxQuantile`` —
  the same sampling Delta uses to compute range ids; the boundary list is
  tiny and ships as a literal, so the mapping is scan-speed and
  distribution-robust, not value-range-dependent).
- :func:`interleave_bits` builds the Morton key from two bucket ids with a
  fixed stack of shift/mask expressions.

``write_zordered`` then range-partitions by the key and sorts within
partitions — a total order is NOT required (pruning only needs locality
within each file), so this avoids a global-sort stage's skew sensitivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits_n(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of N non-negative ints: result
    bit ``n*i + j`` = bit ``i`` of ``cols[j]`` — the N-dimensional Z-curve
    (Delta's OPTIMIZE ZORDER BY takes any column list; so does this).
    ``n * bits`` must fit a signed long (≤ 62); the fixed shift/mask stack
    stays whole-stage-codegen-able at any N."""
    n = len(cols)
    if n < 1:
        raise ValueError("interleave_bits_n needs at least one column")
    if n * bits > 62:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} key bits; the Morton "
            "key must fit a signed long (<= 62) — lower bits= (pruning "
            "needs locality, not precision)"
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                    n * i + j,
                )
            )
    return out


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``."""
    return interleave_bits_n([a, b], bits)


def interleave_bits_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB rendering of :func:`interleave_bits` for oracle queries."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def rank_bucket(df: DataFrame, col: str, bits: int = 8) -> Column:
    """Bucket id in [0, 2^bits) from sampled range boundaries: robust to
    skew and to arbitrary value ranges (an id column in the billions and a
    0-1 score z-order equally well). Boundaries are 2^bits - 1 doubles
    collected once on the driver and inlined as a literal array;
    ``width_bucket`` then assigns buckets JVM-side at scan speed."""
    n = (1 << bits) - 1
    qs = df.approxQuantile(col, [i / (n + 1) for i in range(1, n + 1)], 0.01)
    # Deduplicate: heavy hitters can repeat a boundary, which width_bucket
    # rejects (non-ascending). Fewer distinct boundaries just means fewer
    # occupied buckets — pruning still works.
    bounds = sorted(set(qs))
    raw = (
        F.width_bucket(
            F.col(col).cast("double"),
            F.lit(float(bounds[0])),
            F.lit(float(bounds[-1]) + 1e-9),
            F.lit(len(bounds)),
        )
        - 1
    )
    # Clamp the open ends: width_bucket yields 0 below the first boundary
    # and count+1 above the last — both must land inside [0, 2^bits).
    return (
        F.least(F.greatest(raw, F.lit(0)), F.lit((1 << bits) - 1))
    ).cast("long")


def zorder_key(df: DataFrame, *cols: str, bits: int = 8) -> Column:
    """Morton key over the rank-bucketed columns (N >= 2) — attach with
    withColumn and range-partition/sort by it. ``bits`` is per-dimension;
    total key bits = ``len(cols) * bits`` (must be <= 62, so 3-D keeps the
    default 8, 7-D drops to 8 as well, etc.)."""
    if len(cols) < 2:
        raise ValueError("zorder_key needs at least two columns")
    if len(cols) * bits > 62:
        # validate BEFORE rank_bucket: a too-wide bits= would otherwise
        # ask approxQuantile for 2^bits boundary points first
        raise ValueError(
            f"{len(cols)} columns x {bits} bits = {len(cols) * bits} key "
            "bits; the Morton key must fit a signed long (<= 62) — lower "
            "bits= (pruning needs locality, not precision)"
        )
    return interleave_bits_n(
        [rank_bucket(df, c, bits) for c in cols], bits
    )


def write_zordered(
    df: DataFrame,
    path: str,
    *cols: str,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write ``df`` Z-ordered on ``cols`` (N >= 2): range-partition by the
    Morton key (locality across files) + sort within partitions (locality
    within each file's row groups). Each output file covers a compact
    hyper-rectangle of the N-D key space, so min/max stats prune box
    predicates on ANY subset of the columns."""
    keyed = df.withColumn("__z", zorder_key(df, *cols, bits=bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def pruning_stats(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo, hi], total files) from
    parquet footer metadata — measures how well a layout prunes without
    running a query. Driver-side metadata only; no data read."""
    import os

    import pyarrow.parquet as pq

    eligible = total = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        f_lo = f_hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    f_lo = s.min if f_lo is None else min(f_lo, s.min)
                    f_hi = s.max if f_hi is None else max(f_hi, s.max)
        total += 1
        if f_lo is None or (f_lo <= hi and f_hi >= lo):
            eligible += 1
    return eligible, total
