"""Regression tests for the round-6 advisor findings:

1. Bloom sidecars are only built for integral/string columns (the types
   whose Spark cast-to-string form equals Python str(value)); for any
   other declared bloom_col (double/decimal/timestamp) the writer and
   prober canonical forms differ and a probe would produce a bloom FALSE
   NEGATIVE — read()/targeted DML silently skipping segments that
   contain matching rows. The sidecar also records its value family and
   the prober refuses mismatched or legacy (untyped) sidecars.
2. _partition_may_match must not raw-string-compare mixed timestamp
   spellings: a stored value "2024-01-02 05:00:00" (str(datetime), space
   separator) vs a bound "2024-01-02T05:00:00" (ISO 'T') compares
   ' ' < 'T' and wrongly prunes a segment whose rows match.
3. A streaming empty micro-batch on a NOT-yet-created table must not
   commit a zero-segment manifest — that made the table unreadable (no
   parquet paths → no schema) until the first data batch landed.
4. cancel_execution's drain must not accept the in-flight micro-batch
   (started before the tombstone was written) as proof the tombstone was
   consumed — only a batch whose trigger started after the write counts.
5. overwrite_where on a date-partitioned table must prune the rewrite
   set by partition values (date partition columns get no footer stats),
   so a one-day backfill is O(affected partitions), not O(table).
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from lakehouse_spark.mutation import bloom as B
from lakehouse_spark.mutation.store import TableStore


# -- 1: bloom value-type gating ----------------------------------------------


def test_bloom_not_built_for_double_column(spark, tmp_path):
    """A double bloom_col used to build a sidecar hashing "5.0" while the
    probe hashed "5" — a guaranteed false negative. Now the sidecar is
    simply not built, so the segment is conservatively kept and the read
    stays exact."""
    store = TableStore(
        spark, str(tmp_path / "t"), key="id", bloom_cols=("score", "id")
    )
    store.init(
        spark.createDataFrame(
            [(1, 5.0), (2, 7.5)], "id long, score double"
        )
    )
    seg_dir = os.path.join(store.root, "_seg000000")
    assert not os.path.exists(os.path.join(seg_dir, "_bloom_score.bin"))
    # integral sibling still gets its sidecar (typed)
    with open(os.path.join(seg_dir, "_bloom_id.json")) as f:
        assert json.load(f)["vtype"] == "int"
    # the advisor's exact probe: int 5 against double 5.0 must match
    assert store.read(predicate={"score": 5}).count() == 1


def test_bloom_probe_family_must_match_sidecar(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "t"), key="id", bloom_cols=("id",))
    store.init(spark.createDataFrame([(5, "a"), (7, "b")], "id long, v string"))
    seg = os.path.join(store.root, "_seg000000")
    # matching family loads; mismatched or legacy-untyped refuses
    assert B.load_bloom(seg, "id", "int") is not None
    assert B.load_bloom(seg, "id", "str") is None
    meta_path = os.path.join(seg, "_bloom_id.json")
    with open(meta_path) as f:
        meta = json.load(f)
    del meta["vtype"]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    assert B.load_bloom(seg, "id", "int") is None  # legacy: never prune
    # and the read path stays exact (segment kept, filter applied)
    assert store.read(predicate={"id": 5}).count() == 1


def test_probe_family_rules():
    assert B.probe_family([1, 2]) == "int"
    assert B.probe_family(["a", "b"]) == "str"
    assert B.probe_family([1, "a"]) is None  # mixed
    assert B.probe_family([True]) is None  # bool is not int here
    assert B.probe_family([5.0]) is None
    assert B.probe_family([dt.date(2024, 1, 1)]) is None


# -- 2: partition pruning under mixed timestamp spellings ---------------------


def test_partition_match_mixed_timestamp_separators():
    may = TableStore._partition_may_match
    # stored via json default=str (space separator), probed ISO ('T'):
    # identical instants must MATCH, not prune (' ' < 'T' raw-compare bug)
    part = {"ts": "2024-01-02 05:00:00"}
    assert may(part, {"ts": "2024-01-02T05:00:00"})
    assert may(part, {"ts": ("2024-01-02T00:00:00", "2024-01-02T23:59:59")})
    # genuinely outside the bound still prunes, across spellings
    assert not may(part, {"ts": ("2024-01-03T00:00:00", None)})
    assert not may(part, {"ts": ("2024-01-02 05:00:01", None)})
    # datetime/date objects as bounds compare canonically too
    assert may(part, {"ts": dt.datetime(2024, 1, 2, 5, 0, 0)})
    assert not may(part, {"ts": (dt.datetime(2024, 1, 2, 5, 0, 1), None)})
    # non-temporal junk bound proves nothing: keep
    assert may(part, {"ts": "not-a-timestamp"})
    # aware-vs-naive is incomparable: keep
    assert may(part, {"ts": "2024-01-02T05:00:00+07:00"})


def test_partitioned_timestamp_table_reads_exact(spark, tmp_path):
    store = TableStore(
        spark, str(tmp_path / "t"), key="id", partition_by=("day",)
    )
    rows = [
        (1, dt.datetime(2024, 1, 1, 5, 0, 0), "a"),
        (2, dt.datetime(2024, 1, 2, 5, 0, 0), "b"),
        (3, dt.datetime(2024, 1, 3, 5, 0, 0), "c"),
    ]
    store.init(
        spark.createDataFrame(rows, "id long, day timestamp, v string")
    )
    # ISO-'T' probe of a str(datetime)-stored partition value: must match
    hit = store.read(predicate={"day": "2024-01-02T05:00:00"})
    assert [r.v for r in hit.collect()] == ["b"]
    rng = store.read(
        predicate={"day": ("2024-01-02T00:00:00", "2024-01-02T23:59:59")}
    )
    assert [r.v for r in rng.collect()] == ["b"]
    # and pruning still actually prunes on the canonical compare
    assert len(rng.inputFiles()) < len(store.read().inputFiles())


# -- 3: empty first micro-batch must not create an unreadable table -----------


def test_stream_empty_first_batch_leaves_table_uncreated(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    stream = (
        spark.readStream.schema("id long, v string").json(src_dir)
        .writeStream.format("lakehouse")
        .option("path", out)
        .option("txnAppId", "empty_first")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    # batch 0 with zero input files: nothing may be committed at all
    q = stream.start()
    q.awaitTermination(120)
    store = TableStore(spark, out, key="id")
    assert store.current_version() is None
    # the first DATA batch then creates a normal, readable v0
    with open(os.path.join(src_dir, "a.jsonl"), "w") as f:
        f.write(json.dumps({"id": 1, "v": "x"}) + "\n")
    q = stream.start()
    q.awaitTermination(120)
    assert [r.v for r in store.read().collect()] == ["x"]
    # later empty batches on an EXISTING table still advance the watermark
    q = stream.start()
    q.awaitTermination(120)
    assert store.read().count() == 1


# -- 4: cancel drain ignores the pre-tombstone in-flight batch ----------------


class _FakeQuery:
    """lastProgress replays a scripted sequence; stop() records itself."""

    def __init__(self, progresses):
        self._progresses = list(progresses)
        self.stopped = False

    @property
    def lastProgress(self):
        if len(self._progresses) > 1:
            return self._progresses.pop(0)
        return self._progresses[0]

    def stop(self):
        self.stopped = True


def _iso(offset_sec: float) -> str:
    from datetime import datetime, timedelta, timezone

    t = datetime.now(timezone.utc) + timedelta(seconds=offset_sec)
    return t.isoformat().replace("+00:00", "Z")


def test_cancel_drain_skips_preflight_batch(tmp_path):
    """A batch that STARTED before the tombstone write (listed its files
    pre-tombstone) must not satisfy the drain even though its batchId
    advanced and it consumed input — the old break condition's exact
    false positive."""
    import time

    from lakehouse_spark.streaming.live import cancel_execution

    stale = {"batchId": 7, "numInputRows": 3, "timestamp": _iso(-30)}
    q = _FakeQuery([stale])
    t0 = time.monotonic()
    cancel_execution(
        str(tmp_path), "s1", "2024-01-01T00:00:00Z", 99, query=q,
        drain_timeout_sec=1.0,
    )
    # never satisfied -> waited out the full (short) drain budget
    assert time.monotonic() - t0 >= 0.9
    assert q.stopped


def test_cancel_drain_accepts_post_tombstone_batch(tmp_path):
    import time

    from lakehouse_spark.streaming.live import cancel_execution

    stale = {"batchId": 7, "numInputRows": 3, "timestamp": _iso(-30)}
    fresh = {"batchId": 8, "numInputRows": 1, "timestamp": _iso(5)}
    q = _FakeQuery([stale, stale, fresh])
    t0 = time.monotonic()
    path = cancel_execution(
        str(tmp_path), "s1", "2024-01-01T00:00:00Z", 99, query=q,
        drain_timeout_sec=30.0,
    )
    assert time.monotonic() - t0 < 10  # broke on the fresh batch, not timeout
    assert q.stopped
    assert os.path.exists(path)


# -- 5: overwrite_where prunes by partition values ----------------------------


def test_overwrite_where_prunes_by_date_partition(spark, tmp_path):
    store = TableStore(
        spark, str(tmp_path / "t"), key="id", partition_by=("day",)
    )
    rows = [
        (i, dt.date(2024, 1, 1 + (i % 3)), f"v{i}") for i in range(9)
    ]
    store.init(spark.createDataFrame(rows, "id long, day date, v string"))
    before = store._snapshot(store.current_version())["segments"]
    assert len(before) == 3  # one per day — and days get NO footer stats

    repl = spark.createDataFrame(
        [(100, dt.date(2024, 1, 2), "NEW")], "id long, day date, v string"
    )
    store.overwrite_where(repl, {"day": dt.date(2024, 1, 2)})
    after = store._snapshot(store.current_version())["segments"]
    # the two other day-partitions are reused BY REFERENCE, not rewritten
    reused = [s for s in after if s in before]
    assert len(reused) == 2
    got = sorted(
        (r.day, r.v) for r in store.read().collect() if r.day.day == 2
    )
    assert got == [(dt.date(2024, 1, 2), "NEW")]
    assert store.read().count() == 7  # 3 + 3 survivors + 1 replacement
