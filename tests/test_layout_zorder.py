"""Z-order layout: bit interleave correctness, and the pruning claim
itself — a 2-D box predicate must skip more files under Z-order than under
a single-column sort, on both dimensions at once."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark.operators import layout


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "a long, b long"
    )
    got = [
        r.z
        for r in df.select(
            layout.interleave_bits(F.col("a"), F.col("b"), 4).alias("z")
        ).collect()
    ]
    # z(3,5) : a=0011 -> bits 0,2 ; b=0101 -> bits 1,5 -> 0b100111 = 39
    assert got == [0, 1, 2, 3, 39]


def test_interleave_matches_duckdb_rendering(spark):
    import duckdb

    rows = [(i, (i * 37) % 256) for i in range(100)]
    df = spark.createDataFrame(rows, "a long, b long")
    s = sorted(
        (r.a, r.z)
        for r in df.select(
            "a", layout.interleave_bits(F.col("a"), F.col("b"), 8).alias("z")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    d = sorted(
        con.sql(
            f"SELECT a, {layout.interleave_bits_sql('a', 'b', 8)} AS z FROM t"
        ).fetchall()
    )
    assert s == d


def test_zorder_prunes_2d_box_better_than_single_sort(spark, tmp_path):
    # Two independent uniform dimensions: a single-column sort clusters one
    # and scrambles the other; Z-order clusters both.
    n = 20_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 1000 + 1000) .alias("x"),
        (F.hash(F.col("id") + 7) % 1000 + 1000).alias("y"),
    )
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "xsort")
    layout.write_zordered(df, z_path, "x", "y", bits=8, n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    # Box predicate: one decile in x AND one decile in y.
    zx, zt = layout.pruning_stats(z_path, "x", 1400, 1500)
    zy, _ = layout.pruning_stats(z_path, "y", 1400, 1500)
    sx, st = layout.pruning_stats(s_path, "x", 1400, 1500)
    sy, _ = layout.pruning_stats(s_path, "y", 1400, 1500)

    assert zt == st == 16
    # x-sort: perfect on x, useless on y (every file eligible).
    assert sx <= 3 and sy == 16
    # Z-order: prunes on BOTH dimensions simultaneously.
    assert zx < 16 and zy < 16
    assert zx + zy < sx + sy


def test_rank_bucket_handles_skew(spark):
    # 90% of rows share one hot value; width_bucket boundaries must stay
    # strictly ascending after dedup and every row must get a bucket.
    df = spark.createDataFrame(
        [(7,)] * 900 + [(i,) for i in range(100)], "v long"
    )
    out = df.select(layout.rank_bucket(df, "v", bits=4).alias("b"))
    vals = [r.b for r in out.collect()]
    assert all(v is not None and v >= 0 for v in vals)


def test_zorder_pruning_reflected_in_scan_metrics(spark, tmp_path):
    """End-to-end proof: under the same 2-D box filter the Z-ordered
    layout's SCAN emits far fewer rows (row groups skipped via parquet
    min/max pushdown) than the single-column sort — measured from the
    executed plan's scan metrics, not just footer stats. (numFiles is
    static — file-level skipping only comes from partition pruning; the
    stats-based skipping happens per row group inside the reader.)"""
    from lakehouse_spark.plans.metrics import plan_metrics

    n = 20_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 1000 + 1000).alias("x"),
        (F.hash(F.col("id") + 7) % 1000 + 1000).alias("y"),
    )
    z_path = str(tmp_path / "zm")
    s_path = str(tmp_path / "sm")
    # 64 files: at coarse granularity (16) each Z-file's rectangle spans so
    # much of either axis that the workload margin is inside
    # repartitionByRange's sampling noise; finer chunks make the geometry
    # decisive.
    layout.write_zordered(df, z_path, "x", "y", bits=8, n_files=64)
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    def rows_scanned(path, pred):
        q = spark.read.parquet(path).filter(pred)
        rows = {tuple(r) for r in q.collect()}
        per = plan_metrics(q)
        scan = next(v for k, v in per.items() if k.startswith("Scan parquet"))
        return scan["numOutputRows"], rows

    # The honest workload claim: a single-column sort beats Z-order on
    # queries filtering ONLY that column, but scans EVERYTHING when the
    # other dimension is queried. Over a mixed workload (x-box, y-box,
    # xy-box) Z-order reads less in total — that trade is the whole point.
    preds = [
        F.col("x").between(1400, 1500),
        F.col("y").between(1400, 1500),
        (F.col("x").between(1400, 1500)) & (F.col("y").between(1400, 1500)),
    ]
    z_total = s_total = 0
    for pred in preds:
        z_scan, z_rows = rows_scanned(z_path, pred)
        s_scan, s_rows = rows_scanned(s_path, pred)
        assert z_rows == s_rows  # same answer under every predicate
        z_total += z_scan
        s_total += s_scan
    # y-only on the x-sorted layout reads the full table; z-order never does
    y_scan_sorted, _ = rows_scanned(s_path, preds[1])
    y_scan_z, _ = rows_scanned(z_path, preds[1])
    assert y_scan_sorted == n and y_scan_z < n
    assert z_total < s_total


def test_compact_small_folds_only_subthreshold_segments(spark, tmp_path):
    """OPTIMIZE's bin-packing half: small append segments fold into one,
    already-large segments are carried by REFERENCE (never read or
    rewritten), dv masks over folded segments apply, and the commit is an
    O(changed) delta record."""
    import json

    from lakehouse_spark.mutation.store import TableStore

    st = TableStore(
        spark, str(tmp_path / "t"), key="id", stats_cols=("id",)
    )
    # Big base segment (10k rows), then a tail of tiny appends.
    st.init(spark.range(10_000).selectExpr("id", "id * 2 AS val"))
    for i in range(4):
        st.append(
            spark.range(20_000 + i * 10, 20_000 + i * 10 + 10).selectExpr(
                "id", "id * 2 AS val"
            )
        )
    # A dv over one of the small segments' keys.
    st.delete_keys(spark.range(20_000, 20_003).selectExpr("id"), mode="dv")
    segs_before = st._snapshot(st.current_version())["segments"]
    big = segs_before[0]

    def _bytes(seg):
        import os

        total = 0
        for dp, _d, fs in os.walk(str(tmp_path / "t" / seg)):
            total += sum(os.path.getsize(os.path.join(dp, f)) for f in fs)
        return total

    # Threshold strictly between the biggest small segment and the base.
    cut = (max(_bytes(s) for s in segs_before[1:]) + _bytes(big)) // 2
    assert _bytes(big) > cut
    v = st.compact_small(max_bytes=cut)
    assert v is not None
    m = st._snapshot(v)
    assert big in m["segments"]  # large segment carried by reference
    assert len(m["segments"]) < len(segs_before)
    assert st.read().count() == 10_000 + 40 - 3
    assert st.read().filter("id = 20001").count() == 0  # dv survived fold
    raw = json.load(open(st._manifest_path(v)))
    assert raw.get("delta") == 1 and "segments" not in raw
    assert big not in raw["remove"] and raw["remove"]
    # Idempotent: one folded segment left below threshold → nothing to do.
    assert st.compact_small(max_bytes=cut) is None
    # Cold reader parity.
    cold = TableStore(spark, st.root, key="id", stats_cols=("id",))
    assert cold.read().count() == 10_037


def test_maybe_compact_small_bytes_packs_tail_only(spark, tmp_path):
    from lakehouse_spark.mutation.store import TableStore

    st = TableStore(spark, str(tmp_path / "t2"), key="id", stats_cols=("id",))
    st.init(spark.range(10_000).selectExpr("id", "id * 2 AS val"))
    for i in range(5):
        st.append(
            spark.range(50_000 + i * 5, 50_000 + i * 5 + 5).selectExpr(
                "id", "id * 2 AS val"
            )
        )
    import os as _os

    def _b(seg):
        total = 0
        for dp, _d, fs in _os.walk(str(tmp_path / "t2" / seg)):
            total += sum(
                _os.path.getsize(_os.path.join(dp, f)) for f in fs
            )
        return total

    segs = st._snapshot(st.current_version())["segments"]
    cut = (max(_b(s) for s in segs[1:]) + _b(segs[0])) // 2
    assert not st.maybe_compact(max_segments=16, small_bytes=cut)
    assert st.maybe_compact(max_segments=4, small_bytes=cut)
    m = st._snapshot(st.current_version())
    assert "_seg000000" in m["segments"]  # the large base survived
    assert st.read().count() == 10_025
