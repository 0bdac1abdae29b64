"""Keyed table store: append / upsert / delete-last / retention sweep
(SURVEY.md §1.3 and §2 SC4, SC5, O9, J4, F2-cleanup).

The reference mutates state with append-only JSONL logs plus atomic
tmp+rename document rewrites (sessions/manager.py:282-283,519-525 — read,
not copied). The lakehouse-native equivalents are Delta `APPEND` and
`MERGE`; this container has no Delta package, so the same semantics are
implemented as a **segment-manifest table**, the same idea as Delta's
add-file transaction log:

- data lives in immutable segment directories ``_seg<nnn>/part-*.parquet``;
- a version is a MANIFEST file listing the segments that make it up;
- ``_CURRENT`` is a one-line pointer atomically renamed onto the newest
  manifest — readers always see a complete, consistent version.

Cost model (the part that matters at 100 TB):
- **append is O(new rows)** — write one segment, write a manifest that
  reuses every existing segment. The reference's open(...,'a') cost shape.
- **upsert / merge / delete are O(affected files)** when the key is in
  ``stats_cols`` and the layout clusters it (``compact(range_by=key)``):
  segments whose key range provably contains no source key are reused by
  reference — Delta's stats-targeted file-skipping DML. Unclustered
  layouts degrade to the classic O(table) single-segment rewrite;
  ``delete_keys/upsert/merge(mode="dv")`` are the merge-on-read paths —
  O(changed rows) written, ZERO segments rewritten: old images are masked
  by a deletion vector, new images land in one new segment.
- ``overwrite_where`` (Delta replaceWhere) swaps just the segments the
  predicate can touch — the idempotent-backfill primitive.
- every read-then-rewrite commit carries snapshot-conflict detection: a
  commit landing between the rewrite's read and its claim raises
  :class:`ConcurrentWriteError` instead of being silently clobbered.
- old versions remain readable (time travel) until :meth:`vacuum`.
- **concurrent writers are safe**: each commit claims its version slot with
  a filesystem put-if-absent before writing anything; a racing writer gets
  :class:`ConcurrentWriteError` (retry after re-read), never a lost segment —
  the same optimistic-concurrency contract as Delta's transaction log.

On a cluster with Delta/Iceberg available, `TableStore` maps 1:1 onto
append/`MERGE INTO`/`DELETE`/`OPTIMIZE` — call sites don't change.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# NOTE: no Delta/Iceberg binding ships here — this container has neither, and
# an untestable branch is worse than none. The module docstring documents the
# 1:1 operation mapping (append/MERGE/DELETE/OPTIMIZE) a production deployment
# would swap in behind the same TableStore method surface.

_POINTER = "_CURRENT"
_MANIFEST_RE = re.compile(r"^_manifest_(\d{6})\.json$")
_SEG_RE = re.compile(r"^_seg(\d{6})(?:_\d+)?$")  # optional multi-part suffix
_CDC_RE = re.compile(r"^_cdc(\d{6})$")  # materialized change files per version
# Deletion vectors (deleted-row files). The optional part suffix is used by
# clone(), which renames carried dvs into the clone's version-0 namespace so
# the clone's own future _dv<version> names can never collide with them.
_DV_RE = re.compile(r"^_dv(\d{6})(?:_\d+)?$")


def _segment_may_match(seg_stats: dict | None, predicate: dict) -> bool:
    """Conservative overlap test of a segment's per-column [min, max]
    against a predicate of scalars / (lo, hi) ranges. Missing stats (or an
    all-null column, min==max==None) keep the segment — pruning must never
    change results, only skip provably-impossible files."""
    if not seg_stats:
        return True
    for col, bounds in predicate.items():
        st = seg_stats.get(col)
        if st is None:
            continue
        mn, mx = st
        if mn is None or mx is None:
            continue
        lo, hi = bounds if isinstance(bounds, tuple) else (bounds, bounds)
        try:
            if lo is not None and mx < lo:
                return False
            if hi is not None and mn > hi:
                return False
        except TypeError:
            continue  # incomparable (e.g. JSON-degraded type): keep segment
    return True


def _harvest_dir_stats(path: str, cols: tuple[str, ...]) -> dict:
    """Per-column ``[min, max]`` for the parquet files under ``path``,
    read from the footer statistics the write already produced — **zero
    data IO**, no Spark job. Bounds may be conservative (parquet truncates
    long string stats to a valid lower/upper bound), which is exactly what
    the overlap test needs. Restricted to int/float/string columns so the
    manifest's JSON round-trip stays exact; a column that any file lacks
    stats for (all-null, unsupported type, evolved schema) is omitted and
    pruning conservatively keeps the segment."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    want = set(cols)
    per_file: list[dict] = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        fp = os.path.join(path, fn)
        meta = pq.ParquetFile(fp).metadata
        schema = pq.read_schema(fp)
        stats: dict = {}
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in want or "." in name:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                typ = schema.field(name).type
                if not (
                    pt.is_integer(typ)
                    or pt.is_floating(typ)
                    or pt.is_string(typ)
                ):
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    mn = mn.decode("utf-8", "replace")
                    mx = mx.decode("utf-8", "replace")
                cur = stats.get(name)
                stats[name] = (
                    [mn, mx]
                    if cur is None
                    else [min(cur[0], mn), max(cur[1], mx)]
                )
        if meta.num_rows:
            per_file.append(stats)
    if not per_file:
        return {}
    common = set.intersection(*[set(s) for s in per_file])
    merged: dict = {}
    for s in per_file:
        for c in common:
            mn, mx = s[c]
            cur = merged.get(c)
            merged[c] = (
                [mn, mx]
                if cur is None
                else [min(cur[0], mn), max(cur[1], mx)]
            )
    return merged


def _predicate_expr(predicate: dict):
    """The exact Catalyst filter a stats predicate stands for: AND of
    per-column range terms (scalar = equality, (lo, hi) = closed range,
    None bound = unbounded). Returns None for an empty predicate."""
    cond = None
    for c, bounds in predicate.items():
        lo, hi = bounds if isinstance(bounds, tuple) else (bounds, bounds)
        for b, op in ((lo, "__ge__"), (hi, "__le__")):
            if b is not None:
                term = getattr(F.col(c), op)(F.lit(b))
                cond = term if cond is None else (cond & term)
    return cond


class ConcurrentWriteError(RuntimeError):
    """Another writer claimed the next version first. The table is intact at
    its current version; re-read and retry the mutation (the same contract as
    Delta's ConcurrentAppendException)."""


class ConstraintViolationError(ValueError):
    """A write produced rows that fail a table CHECK constraint (or
    ``add_constraint`` found existing rows that do). The commit was aborted
    before the pointer moved, so readers never saw the violating data —
    Delta's InvariantViolationException contract."""


class SchemaMismatchError(TypeError):
    """An append carried a column whose type conflicts with the table's
    schema. Committing it would not corrupt that one write — it would brick
    EVERY subsequent read of the whole table (parquet schema merge fails at
    scan planning). Delta rejects this at write time (schema enforcement);
    so does this store. Adding NEW columns is fine (additive evolution);
    changing a column's type needs an explicit ``overwrite``."""


class TableStore:
    """Versioned keyed Parquet table: segment data, manifest versions,
    atomic pointer commits."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key: str,
        orphan_grace_sec: float = 300.0,
        stats_cols: tuple[str, ...] = (),
        write_cdf: bool = False,
        bloom_cols: tuple[str, ...] = (),
        partition_by: tuple[str, ...] = (),
        max_partitions_per_commit: int = 64,
    ):
        self.spark = spark
        self.root = root
        self.key = key
        # Delta's delta.enableChangeDataFeed analog: when True, every
        # REWRITE commit materializes its row-level changes to a
        # ``_cdc<nnnnnn>`` parquet dir right after the pointer swap (append
        # commits never need one — their added segments ARE the change
        # file). Stored changes make :meth:`changes` O(changes-read) for
        # rewrites and are what the streaming source
        # (sources/table_source.py) consumes, since a stream worker cannot
        # run the snapshot diff itself.
        self.write_cdf = write_cdf
        # Columns whose per-segment min/max ride in the manifest (Delta's
        # add-file stats): read(predicate=...) skips whole segments whose
        # range can't match BEFORE Spark lists a single data file. Declare
        # the columns queries range-filter on (numeric or string); stats
        # cost one column-pruned scan of each NEW segment at commit time.
        self.stats_cols = tuple(stats_cols)
        # Columns that get a per-segment Bloom sidecar at write time
        # (mutation/bloom.py): equality lookups and targeted DML can then
        # prove a key is ABSENT from a segment even when the layout is
        # unclustered and min/max stats span everything (UUID-style keys).
        # Costs one distributed hash pass per new segment; probing is
        # sidecar-file IO only. Readers need no declaration — they
        # discover sidecars by existence.
        self.bloom_cols = tuple(bloom_cols)
        # Delta's partitionBy: every commit splits its rows into one
        # segment per live (partition-column-tuple) value, so a partition
        # predicate prunes EXACTLY at the manifest (min==max per segment —
        # the existing stats machinery — plus the recorded value itself),
        # replaceWhere on a partition swaps just that partition's segments,
        # and compaction never merges across partition boundaries. The
        # partition columns STAY in the data files (constant columns are
        # ~free under parquet RLE), so every read path — including targeted
        # DML and the Python data source — is unchanged. Set at table
        # creation only; recorded in every manifest. Use for
        # low-cardinality columns (ingest date, source, tenant): each
        # commit may touch at most ``max_partitions_per_commit`` distinct
        # values (Delta's small-file guidance, enforced).
        self.partition_by = tuple(partition_by)
        self.max_partitions_per_commit = max_partitions_per_commit
        self._pending_parts: dict[str, dict] = {}
        self._pending_stats: dict[str, dict] = {}
        # Deletion vector staged by delete_keys(mode="dv") for the commit
        # in flight: {dv_name: [segments it applies to]}. Consumed by
        # _transact; cleared on abort like _pending_stats.
        self._pending_dv: dict[str, list[str]] = {}
        # A zero-length claim file older than this is treated as the debris
        # of a writer that died between claim and finalize, and is stolen.
        # Must comfortably exceed the longest segment write a live writer
        # could be performing under the claim.
        self.orphan_grace_sec = orphan_grace_sec
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping -------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def current_version(self) -> int | None:
        try:
            with open(self._pointer_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.root, f"_manifest_{v:06d}.json")

    def _segments(self, v: int) -> list[str]:
        with open(self._manifest_path(v)) as f:
            return json.load(f)["segments"]

    def _write_segment(self, df: DataFrame, v: int, part: int | None = None) -> str:
        seg = f"_seg{v:06d}" if part is None else f"_seg{v:06d}_{part:02d}"
        path = os.path.join(self.root, seg)
        self._enforce_constraints(df)
        # Single logical→physical choke point: every write path funnels
        # here, so files always store PHYSICAL names regardless of which
        # renames are live (no-op when none are). Idempotent on frames
        # that are already physical (internal rewrite paths).
        df = self._to_physical(df)
        inv = {log: phy for phy, log in self.renames().items()}
        df.write.mode("overwrite").parquet(path)
        # Partition columns always get footer stats too: a partitioned
        # segment holds one value, so min==max makes every stats-driven
        # path (read predicates, targeted DML, the data source's pushed
        # filters) prune partitions exactly with zero new machinery.
        stat_cols = tuple(dict.fromkeys(self.stats_cols + self.partition_cols()))
        if stat_cols:
            # Stats from the WRITTEN files' parquet footers — no second
            # Spark job, no data re-read; the bounds describe exactly what
            # readers will see (conservative where parquet truncates).
            # stats_cols is user config in LOGICAL names; footers (and the
            # stats manifest) are physical.
            stats = _harvest_dir_stats(
                path, tuple(inv.get(c, c) for c in stat_cols)
            )
            if stats:
                self._pending_stats[seg] = stats
        if self.bloom_cols:
            from lakehouse_spark.mutation.bloom import build_segment_blooms

            build_segment_blooms(
                self.spark, path, [inv.get(c, c) for c in self.bloom_cols]
            )
        return seg

    # -- partitioning (Delta's partitionBy) -----------------------------------

    def partition_cols(self) -> tuple[str, ...]:
        """The table's partition columns — the committed manifest's record
        wins over the constructor (so a second instance opened without the
        arg still partitions correctly); a conflicting constructor value is
        an error, not a silent re-partition."""
        v = self.current_version()
        if v is None:
            return self.partition_by
        with open(self._manifest_path(v)) as f:
            committed = tuple(json.load(f).get("partition_by", []))
        if self.partition_by and committed != self.partition_by:
            raise ValueError(
                f"table {self.root} is partitioned by {list(committed)}, "
                f"constructor said {list(self.partition_by)}; partitioning "
                "is fixed at table creation"
            )
        return committed

    def _write_partitioned(self, df: DataFrame, v: int) -> list[str]:
        """Write ``df`` as one segment per live partition-value tuple
        (single unsuffixed segment when the table isn't partitioned).
        Records each segment's exact partition values for manifest-level
        pruning and partition-wise compaction. Cost: one distinct() over
        the partition columns plus one filtered write per value tuple, off
        a persisted input — bounded by ``max_partitions_per_commit``, the
        same 'commits touch few partitions' contract Delta's layout
        assumes."""
        pcols = self.partition_cols()
        if not pcols:
            return [self._write_segment(df, v)]
        missing = [c for c in pcols if c not in df.columns]
        if missing:
            raise ValueError(
                f"write to {self.root} is missing partition column(s) "
                f"{missing}; partitioned tables require them on every row"
            )
        cap = self.max_partitions_per_commit
        cached = df.persist()  # distinct + per-value filters share one compute
        try:
            combos = cached.select(*pcols).distinct().limit(cap + 1).collect()
            if len(combos) > cap:
                raise ValueError(
                    f"commit touches more than {cap} distinct partition "
                    f"values of {list(pcols)}; partition by a lower-"
                    "cardinality column or raise max_partitions_per_commit"
                )
            if not combos:
                # Empty write: on the FIRST commit, one empty segment holds
                # the schema; afterwards, adding a value-less segment would
                # only burden every partition-pruned read and DML (no
                # partition entry → conservatively kept/touched forever).
                if self.current_version() is None:
                    return [self._write_segment(cached, v)]
                return []
            combos = sorted(
                (tuple(r[c] for c in pcols) for r in combos),
                key=lambda t: json.dumps(t, default=str),
            )
            segs = []
            for i, combo in enumerate(combos):
                cond = None
                for c, val in zip(pcols, combo):
                    term = F.col(c).eqNullSafe(F.lit(val))
                    cond = term if cond is None else (cond & term)
                seg = self._write_segment(
                    cached.filter(cond), v, part=i if len(combos) > 1 else None
                )
                self._pending_parts[seg] = dict(zip(pcols, combo))
                segs.append(seg)
            return segs
        finally:
            cached.unpersist()

    def partitions(self) -> list[dict]:
        """SHOW PARTITIONS: the live partition-value tuples with their
        segment counts, straight from the HEAD manifest — no data IO."""
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        with open(self._manifest_path(v)) as f:
            m = json.load(f)
        out: dict[str, dict] = {}
        for s in m["segments"]:
            p = m.get("partitions", {}).get(s)
            if p is None:
                continue
            k = json.dumps(p, sort_keys=True, default=str)
            e = out.setdefault(k, {"values": p, "num_segments": 0})
            e["num_segments"] += 1
        return sorted(out.values(), key=lambda e: json.dumps(e["values"], default=str))

    @staticmethod
    def _canon_temporal(x):
        """A naive-comparable ``datetime`` for date/datetime/ISO-ish-string
        inputs, else None. Normalizes the two spellings the same instant
        arrives in — ``str(datetime)`` uses a space separator, ISO-8601
        uses 'T' — so pruning never compares them as raw strings (' '<'T'
        would wrongly prune)."""
        import datetime as _dt

        if isinstance(x, _dt.datetime):
            return x
        if isinstance(x, _dt.date):
            return _dt.datetime(x.year, x.month, x.day)
        if isinstance(x, str):
            try:
                return _dt.datetime.fromisoformat(x.replace(" ", "T"))
            except ValueError:
                return None
        return None

    @classmethod
    def _part_lt(cls, a, b) -> bool:
        """PROVABLY ``a < b`` for partition pruning; False whenever the
        ordering is ambiguous (pruning must stay conservative).

        The manifest stores date/timestamp partition values JSON-degraded
        to ``str(value)`` (space separator) while probe bounds arrive as
        ISO-'T' strings or date/datetime objects — raw string order
        compares ``' ' < 'T'`` and would wrongly prune the matching
        segment. Rules:

        - both strings, both parse temporally → prune only when the raw
          AND canonical orders agree (sound for degraded timestamps AND
          for genuine string columns holding timestamp-like text);
        - both strings, exactly one parses → ambiguous, keep;
        - string vs native temporal (TypeError) → canonical order alone
          (the probe type proves the column is temporal);
        - natively comparable → plain ``<``."""
        if isinstance(a, str) and isinstance(b, str):
            ca, cb = cls._canon_temporal(a), cls._canon_temporal(b)
            if ca is not None and cb is not None:
                try:
                    return ca < cb and a < b
                except TypeError:
                    return False  # aware vs naive: incomparable
            if ca is not None or cb is not None:
                return False  # temporal vs junk: proves nothing
            return a < b
        try:
            return a < b
        except TypeError:
            ca, cb = cls._canon_temporal(a), cls._canon_temporal(b)
            if ca is None or cb is None:
                return False
            try:
                return ca < cb
            except TypeError:
                return False

    @classmethod
    def _partition_may_match(cls, part: dict | None, predicate: dict) -> bool:
        """Exact manifest-value pruning for partitioned segments: a segment
        holds exactly one partition-value tuple, so an equality or range
        term on a partition column either matches it or provably doesn't.
        Segments without recorded values (pre-partitioning history) are
        kept — pruning must never change results."""
        if not part:
            return True
        for col, bounds in predicate.items():
            if col not in part:
                continue
            val = part[col]
            if val is None:
                continue  # null partition values are never pruned
            lo, hi = bounds if isinstance(bounds, tuple) else (bounds, bounds)
            if lo is not None and cls._part_lt(val, lo):
                return False
            if hi is not None and cls._part_lt(hi, val):
                return False
        return True

    # -- CHECK constraints ---------------------------------------------------

    @staticmethod
    def _violation_cond(exprs: dict[str, str]):
        """Rows failing ANY constraint. SQL CHECK semantics: NULL passes —
        a row violates only when the expression evaluates to FALSE."""
        cond = None
        for e in exprs.values():
            term = ~F.coalesce(F.expr(e), F.lit(True))
            cond = term if cond is None else (cond | term)
        return cond

    def constraints(self) -> dict[str, str]:
        """The table's CHECK constraints ``{name: sql_expr}`` at HEAD."""
        v = self.current_version()
        if v is None:
            return {}
        with open(self._manifest_path(v)) as f:
            return json.load(f).get("constraints", {})

    def _enforce_constraints(self, df: DataFrame) -> None:
        """Every segment this store writes — new rows, merge post-images,
        compaction rewrites alike — is checked against the HEAD manifest's
        constraints before any data lands. Cost: one extra filter+limit(1)
        job per written segment, only when constraints exist; rewrites of
        already-valid data re-verify by design (the cheap, unskippable
        invariant). Raises before the parquet write, so the enclosing
        transaction aborts with the pointer unmoved."""
        cons = dict(self.constraints())
        # Generated columns enforce as implicit constraints: a provided
        # value must agree with its formula (NULL-safe equality). Frames
        # that lack the column entirely are exempt — set_generated already
        # proved those rows read back consistent (they surface as nulls
        # under mergeSchema, and declaration-time validation covered that).
        for col, expr in self.generated_columns().items():
            if col in df.columns:
                cons[f"generated:{col}"] = f"{col} <=> ({expr})"
        if not cons:
            return
        bad = df.filter(self._violation_cond(cons)).limit(1).collect()
        if bad:
            raise ConstraintViolationError(
                f"write to {self.root} violates CHECK constraint(s) "
                f"{sorted(cons)}; first offending row: {bad[0].asDict()}"
            )

    def add_constraint(self, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT name CHECK (expr). Validates the LIVE
        table (deletion vectors applied) first — existing violations reject
        the constraint, exactly Delta's contract — then commits a
        metadata-only version carrying it, so every later write (append,
        upsert, merge, overwrite, compaction) enforces it. Conflict-safe:
        the commit claims base+1 or raises ConcurrentWriteError."""
        if not self.exists():
            raise ValueError(f"no table at {self.root}")
        cons = self.constraints()
        if name in cons:
            raise ValueError(f"constraint {name!r} already exists")
        cur = self.current_version()
        bad = self.read().filter(self._violation_cond({name: expr})).limit(
            1
        ).collect()
        if bad:
            raise ConstraintViolationError(
                f"existing rows violate {name!r} ({expr}); first offender: "
                f"{bad[0].asDict()}"
            )
        return self._transact(
            lambda v: self._segments(v - 1),
            constraints_override={**cons, name: expr},
            base_version=cur,
        )

    # -- generated columns ---------------------------------------------------

    def generated_columns(self) -> dict[str, str]:
        """The table's generated columns ``{col: sql_expr}`` at HEAD."""
        v = self.current_version()
        if v is None:
            return {}
        with open(self._manifest_path(v)) as f:
            return json.load(f).get("generated", {})

    def set_generated(self, col: str, expr: str) -> int:
        """Declare ``col`` GENERATED ALWAYS AS (expr) — Delta's generated
        columns. Appends/overwrites that omit the column get it computed;
        writes that DO provide it (including merge/upsert post-images) are
        validated to satisfy ``col <=> (expr)`` by the same enforcement
        pass as CHECK constraints, so a caller can never commit a value
        that disagrees with the formula. Existing rows are validated
        first, like add_constraint. Declare the column in ``stats_cols``
        too and derived-value predicates prune segments — the Delta
        generated-column partition-pruning story at manifest scale."""
        if not self.exists():
            raise ValueError(f"no table at {self.root}")
        gen = self.generated_columns()
        if col in gen:
            raise ValueError(f"column {col!r} is already generated")
        cur = self.current_version()
        check = f"{col} <=> ({expr})"
        bad = self.read().filter(
            self._violation_cond({col: check})
        ).limit(1).collect()
        if bad:
            raise ConstraintViolationError(
                f"existing rows violate GENERATED {col} AS ({expr}); "
                f"first offender: {bad[0].asDict()}"
            )
        return self._transact(
            lambda v: self._segments(v - 1),
            generated_override={**gen, col: expr},
            base_version=cur,
        )

    def drop_generated(self, col: str) -> int:
        """Remove the generated-column declaration (the data stays)."""
        gen = self.generated_columns()
        if col not in gen:
            raise KeyError(f"no generated column {col!r} on {self.root}")
        gen = {k: v for k, v in gen.items() if k != col}
        return self._transact(
            lambda v: self._segments(v - 1),
            generated_override=gen,
            base_version=self.current_version(),
        )

    def _apply_generated(self, rows: DataFrame) -> DataFrame:
        """Fill in any declared generated column the input omits. Columns
        the caller provided are left as-is — the enforcement pass will
        reject them if they disagree with the formula."""
        for col, expr in self.generated_columns().items():
            if col not in rows.columns:
                rows = rows.withColumn(col, F.expr(expr))
        return rows

    # -- column mapping: metadata-only RENAME / DROP COLUMN ------------------

    def renames(self) -> dict[str, str]:
        """Active column renames ``{physical_name: logical_name}`` at HEAD.
        Physical names are the column names actually stored in parquet
        (immutable once written); logical names are what every public read
        and write surface speaks. Empty for tables that never renamed."""
        v = self.current_version()
        if v is None:
            return {}
        with open(self._manifest_path(v)) as f:
            return json.load(f).get("renames", {})

    def dropped_columns(self) -> list[str]:
        """Physical names dropped from the logical schema at HEAD. The
        bytes stay in old segments (invisible to every read) until a
        rewrite (compact / DML) purges them — Delta's DROP COLUMN +
        REORG PURGE split."""
        v = self.current_version()
        if v is None:
            return []
        with open(self._manifest_path(v)) as f:
            return json.load(f).get("dropped", [])

    def _guard_col_mutation(self, logical: str) -> None:
        """Shared preconditions for rename/drop: the key column and any
        column a CHECK constraint or generated-column formula references
        are immovable (Delta blocks exactly these), because their
        expressions/joins are written against the name."""
        key = self.key or self._manifest_key()
        if logical == key:
            raise ValueError(
                f"cannot rename/drop the key column {logical!r}: deletion "
                "vectors, MERGE, and upsert join on it by name"
            )
        if logical in self.partition_cols():
            raise ValueError(
                f"cannot rename/drop partition column {logical!r}: the "
                "manifest's per-segment partition values are keyed on it"
            )
        pat = re.compile(rf"\b{re.escape(logical)}\b")
        for name, expr in self.constraints().items():
            if pat.search(expr):
                raise ValueError(
                    f"column {logical!r} is referenced by CHECK constraint "
                    f"{name!r} ({expr}); drop the constraint first"
                )
        for col, expr in self.generated_columns().items():
            if col == logical or pat.search(expr):
                raise ValueError(
                    f"column {logical!r} is a generated column or referenced "
                    f"by generated column {col!r} ({expr}); drop the "
                    "generation rule first"
                )

    def _manifest_key(self) -> str:
        v = self.current_version()
        if v is None:
            return ""
        with open(self._manifest_path(v)) as f:
            return json.load(f).get("key", "")

    def _logical_columns(self) -> list[str]:
        """Current logical schema's column names (physical schema with
        drops removed and renames applied)."""
        renames, dropped = self.renames(), set(self.dropped_columns())
        phys = self._read_segments_schema_cols()
        return [renames.get(c, c) for c in phys if c not in dropped]

    def _read_segments_schema_cols(self) -> list[str]:
        v = self.current_version()
        with open(self._manifest_path(v)) as f:
            m = json.load(f)
        return self._read_segments(m["segments"], m.get("dv", {})).columns

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN, metadata-only — Delta's column
        mapping: no data file is touched (at 100 TB a rename that rewrote
        the table would be an outage), the manifest records
        ``physical → logical`` and every read/write surface translates at
        the boundary. Blocked for the key column and columns referenced by
        CHECK constraints or generated-column formulas (Delta's rule).
        ``new`` must not collide with any live logical OR physical name —
        physical names are forever (old segments carry them), so reusing
        one would make mergeSchema conflate two different columns."""
        if not self.exists():
            raise FileNotFoundError(f"no table at {self.root}")
        self._guard_col_mutation(old)
        logical = self._logical_columns()
        if old not in logical:
            raise KeyError(f"no column {old!r} (have {logical})")
        if new in logical:
            raise ValueError(f"column {new!r} already exists")
        renames, dropped = self.renames(), self.dropped_columns()
        phys_live = set(self._read_segments_schema_cols()) | set(dropped)
        inv = {log: phy for phy, log in renames.items()}
        phys_of_old = inv.get(old, old)
        if new in phys_live and new != phys_of_old:
            raise ValueError(
                f"{new!r} is the physical storage name of another column; "
                "pick a different name (physical names are immutable)"
            )
        renames = dict(renames)
        if new == phys_of_old:  # renaming back to the stored name
            renames.pop(phys_of_old, None)
        else:
            renames[phys_of_old] = new
        return self._transact(
            lambda v: self._segments(v - 1),
            meta={"rename_column": [old, new]},
            base_version=self.current_version(),
            columns_override=(renames, dropped),
        )

    def drop_column(self, col: str) -> int:
        """ALTER TABLE DROP COLUMN, metadata-only: the column vanishes from
        the logical schema instantly; the stored bytes die lazily as
        rewrites purge them (any compact / DML rewrite writes the logical
        schema, so purging is free where it matters). The name stays
        reserved — re-adding it would resurrect old segments' bytes via
        schema merge."""
        if not self.exists():
            raise FileNotFoundError(f"no table at {self.root}")
        self._guard_col_mutation(col)
        logical = self._logical_columns()
        if col not in logical:
            raise KeyError(f"no column {col!r} (have {logical})")
        renames, dropped = dict(self.renames()), list(self.dropped_columns())
        inv = {log: phy for phy, log in renames.items()}
        phys = inv.get(col, col)
        renames.pop(phys, None)
        dropped.append(phys)
        return self._transact(
            lambda v: self._segments(v - 1),
            meta={"drop_column": col},
            base_version=self.current_version(),
            columns_override=(renames, dropped),
        )

    def _to_physical(self, df: DataFrame) -> DataFrame:
        """Translate a LOGICAL frame (public input) to PHYSICAL storage
        names. Idempotent on already-physical frames. Rejects columns that
        collide with reserved physical names (a renamed column's storage
        name, or a dropped column's name) — writing them would conflate
        distinct columns at schema-merge time."""
        renames, dropped = self.renames(), self.dropped_columns()
        if not renames and not dropped:
            return df
        inv = {log: phy for phy, log in renames.items()}
        cols = []
        for c in df.columns:
            if c in dropped:
                raise ValueError(
                    f"column {c!r} was dropped from {self.root}; the name "
                    "is reserved (old segments still store those bytes) — "
                    "use a new name"
                )
            if c in renames and renames[c] != c and c not in inv:
                raise ValueError(
                    f"column {c!r} is the physical storage name of renamed "
                    f"column {renames[c]!r}; write it as {renames[c]!r}"
                )
            cols.append(F.col(c).alias(inv.get(c, c)))
        return df.select(cols)

    @staticmethod
    def _to_logical_static(
        df: DataFrame, renames: dict[str, str], dropped: list[str]
    ) -> DataFrame:
        if not renames and not dropped:
            return df
        cols = [
            F.col(c).alias(renames.get(c, c))
            for c in df.columns
            if c not in dropped
        ]
        return df.select(cols)

    def _to_logical(self, df: DataFrame) -> DataFrame:
        """Translate a PHYSICAL frame to the HEAD logical schema."""
        return self._to_logical_static(df, self.renames(), self.dropped_columns())

    def _pred_to_physical(self, predicate: dict | None) -> dict | None:
        """Map a logical predicate's column names to physical (stats,
        bloom sidecars, and stored files are all keyed physically)."""
        if not predicate:
            return predicate
        inv = {log: phy for phy, log in self.renames().items()}
        if not inv:
            return predicate
        return {inv.get(c, c): b for c, b in predicate.items()}

    def drop_constraint(self, name: str) -> int:
        """ALTER TABLE DROP CONSTRAINT: metadata-only commit without it."""
        cons = self.constraints()
        if name not in cons:
            raise KeyError(f"no constraint {name!r} on {self.root}")
        cons = {k: v for k, v in cons.items() if k != name}
        return self._transact(
            lambda v: self._segments(v - 1),
            constraints_override=cons,
            base_version=self.current_version(),
        )

    # -- clone / detail ------------------------------------------------------

    @staticmethod
    def _link_tree(src: str, dst: str, deep: bool) -> None:
        for dirpath, _dirnames, filenames in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            tgt = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(tgt, exist_ok=True)
            for fn in filenames:
                s, d = os.path.join(dirpath, fn), os.path.join(tgt, fn)
                if deep:
                    shutil.copy2(s, d)
                else:
                    try:
                        os.link(s, d)
                    except OSError:
                        shutil.copy2(s, d)  # cross-device: degrade to copy

    def clone(
        self,
        dst_root: str,
        version: int | None = None,
        deep: bool = False,
    ) -> "TableStore":
        """CLONE (Delta's CREATE TABLE ... [SHALLOW|DEEP] CLONE): an
        independent table born from one source version. Shallow clones
        hardlink the immutable segment files — O(files) metadata ops and
        zero data copy on one filesystem (cross-device silently degrades
        to copies), the local-FS analog of Delta's by-reference shallow
        clone. Deep copies the bytes. The clone starts at version 0
        carrying the source version's segments, per-segment stats, Bloom
        sidecars (they live inside the linked segment dirs), live deletion
        vectors, key, CHECK constraints, generated columns, and column
        mapping (renames/drops); ``meta`` records the provenance. Writes, compaction, and vacuum on either side never
        disturb the other: segments are immutable, and hardlink refcounts
        keep shared files alive until BOTH tables drop them."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        with open(self._manifest_path(v)) as f:
            m = json.load(f)
        dst = TableStore(
            self.spark,
            dst_root,
            key=self.key or m.get("key", ""),
            stats_cols=self.stats_cols,
            write_cdf=self.write_cdf,
            bloom_cols=self.bloom_cols,
        )
        if dst.exists():
            raise ValueError(f"clone target {dst_root} is already a table")
        live_dv = m.get("dv", {})
        # Everything carried is RENAMED into the clone's version-0
        # namespace: source segment names embed SOURCE version numbers
        # (_seg000005), and the clone starts at version 0 — its own later
        # commits would claim those very names and overwrite the linked
        # dirs (clobbering the clone's v0 while the source keeps its own
        # hardlinks — a silently wrong clone). _seg000000_<i> /
        # _dv000000_<i> parse as v0 artifacts for vacuum and can never be
        # re-claimed: _write_segment only emits names for versions >= 1 on
        # a table that already has a version 0.
        seg_map = {
            s: ("_seg000000" if i == 0 else f"_seg000000_{i}")
            for i, s in enumerate(m["segments"])
        }
        dv_map = {n: f"_dv000000_{j}" for j, n in enumerate(live_dv)}
        for src_name, dst_name in {**seg_map, **dv_map}.items():
            self._link_tree(
                os.path.join(self.root, src_name),
                os.path.join(dst_root, dst_name),
                deep,
            )

        # partition_by rides through _transact's creation path (a fresh
        # table records the instance's value), so the clone partitions
        # exactly like its source from version 0 on.
        dst.partition_by = tuple(m.get("partition_by", []))

        def _segments(_v: int) -> list[str]:
            # Seed carried state INSIDE the transaction so _transact's
            # abort-cleanup snapshot (taken at txn start) doesn't classify
            # it as leftovers from a previous attempt.
            for s, st in m.get("stats", {}).items():
                if s in seg_map:
                    dst._pending_stats[seg_map[s]] = st
            for s, p in m.get("partitions", {}).items():
                if s in seg_map:
                    dst._pending_parts[seg_map[s]] = p
            for n, ap in live_dv.items():
                dst._pending_dv[dv_map[n]] = [
                    seg_map[s] for s in ap if s in seg_map
                ]
            return [seg_map[s] for s in m["segments"]]

        dst._transact(
            _segments,
            meta={"cloned_from": self.root, "source_version": v},
            constraints_override=m.get("constraints", {}),
            generated_override=m.get("generated", {}),
            columns_override=(m.get("renames", {}), m.get("dropped", [])),
        )
        return dst

    def detail(self) -> dict:
        """DESCRIBE DETAIL: one dict summarizing the table at HEAD —
        version, segment/deletion-vector counts, on-disk bytes of live
        segments, stats/bloom coverage, constraints, and key column."""
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        with open(self._manifest_path(v)) as f:
            m = json.load(f)
        size = 0
        n_files = 0
        for s in m["segments"]:
            for dirpath, _d, files in os.walk(os.path.join(self.root, s)):
                for fn in files:
                    if fn.endswith(".parquet"):
                        n_files += 1
                    size += os.path.getsize(os.path.join(dirpath, fn))
        stats = m.get("stats", {})
        return {
            "location": self.root,
            "version": v,
            "key": m.get("key", ""),
            "num_segments": len(m["segments"]),
            "num_data_files": n_files,
            "size_bytes": size,
            "num_deletion_vectors": len(m.get("dv", {})),
            "constraints": dict(m.get("constraints", {})),
            "stats_columns": sorted(
                {c for st in stats.values() for c in st}
            ),
            "segments_with_stats": sum(1 for s in m["segments"] if s in stats),
            "generated": dict(m.get("generated", {})),
            "renames": dict(m.get("renames", {})),
            "dropped": list(m.get("dropped", [])),
            "partition_by": list(m.get("partition_by", [])),
            "num_partitions": len(
                {
                    json.dumps(p, sort_keys=True, default=str)
                    for p in m.get("partitions", {}).values()
                }
            ),
            "meta": m.get("meta", {}),
        }

    def _claim(self, v: int) -> None:
        """Claim version ``v`` with an O_EXCL create of its manifest file —
        filesystem put-if-absent, the same primitive Delta's transaction log
        uses. Exactly one writer wins a slot; losers get
        :class:`ConcurrentWriteError` with the table untouched."""
        try:
            fd = os.open(
                self._manifest_path(v), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
            os.close(fd)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"version {v} of {self.root} already claimed by another "
                "writer; re-read and retry"
            ) from None

    def _swap_pointer(self, v: int) -> None:
        """Atomic pointer write via a caller-unique tmp name: two writers
        advancing to the SAME version (a committer racing a roll-forward
        recoverer) must not share a tmp file, or one replace can observe the
        other's already-renamed path."""
        ptmp = (
            f"{self._pointer_path()}.tmp.{os.getpid()}.{threading.get_ident()}"
        )
        with open(ptmp, "w") as f:
            f.write(str(v))
        os.replace(ptmp, self._pointer_path())

    def _recover_slot(self, v: int) -> bool:
        """Attempt recovery after a claim conflict at version ``v``. Returns
        True when the world changed such that one retry may succeed:

        - the conflicting manifest is FINALIZED (non-empty) but the pointer
          still lags: a writer crashed between manifest finalize and pointer
          swap. The commit is durable — roll the pointer forward (idempotent
          if the original writer races us) and retry at the next slot.
        - the conflicting file is a ZERO-LENGTH claim older than
          ``orphan_grace_sec``: a writer died between claim and finalize
          (kill -9). Steal it with an atomic rename — exactly one stealer
          wins — and retry the same slot.

        A fresh zero-length claim is a LIVE writer mid-commit: no recovery,
        the caller's ConcurrentWriteError stands."""
        path = self._manifest_path(v)
        try:
            st = os.stat(path)
        except FileNotFoundError:
            return True  # aborting writer released the claim between checks
        if st.st_size > 0:
            cur = self.current_version()
            if cur is None or cur < v:
                self._swap_pointer(v)
                return True
            return False  # pointer already caught up; plain lost race
        if time.time() - st.st_mtime < self.orphan_grace_sec:
            return False  # live in-flight writer holds the claim
        stale = f"{path}.orphan.{os.getpid()}.{threading.get_ident()}"
        try:
            os.rename(path, stale)  # put-if-absent in reverse: one winner
        except FileNotFoundError:
            return True
        os.unlink(stale)
        return True

    def _transact(
        self,
        make_segments,
        meta: dict | None = None,
        txn: tuple[str, int] | None = None,
        dv_override: dict[str, list[str]] | None = None,
        base_version: int | None = None,
        constraints_override: dict[str, str] | None = None,
        generated_override: dict[str, str] | None = None,
        columns_override: tuple[dict, list] | None = None,
    ) -> int:
        """Optimistic-concurrency commit: claim the next version slot FIRST
        (so concurrent writers fail fast instead of overwriting each other's
        segment/manifest files), then build segments, finalize the manifest,
        and atomically swap the pointer. The pointer only ever advances to a
        finalized manifest, so readers never observe a partial commit; an
        aborted transaction releases its claim. ``meta`` rides in the
        manifest; ``txn=(app_id, version)`` records an idempotence watermark
        that is CARRIED FORWARD into every later commit's manifest (the same
        protocol as Delta's SetTransaction actions): an exactly-once sink's
        high-water mark survives interleaved upserts/deletes/compactions and
        other apps' commits, because the head manifest always holds the max
        committed txn version per app.

        ``base_version`` is snapshot-conflict detection for read-then-rewrite
        commits (upsert / merge / delete / replaceWhere): those paths read
        the table at some version and write a result derived from it, so a
        commit that landed BETWEEN their read and their claim would be
        silently clobbered by the rewrite. Passing the version the rewrite
        read makes the commit claim exactly ``base_version + 1`` or raise
        :class:`ConcurrentWriteError` — Delta's ConcurrentAppendException
        contract: re-read and retry the whole mutation. Appends don't need
        it (they resolve prior segments INSIDE the claimed transaction)."""
        for attempt in range(2):
            cur = self.current_version()
            nxt = 0 if cur is None else cur + 1
            try:
                self._claim(nxt)
                break
            except ConcurrentWriteError:
                if attempt == 1 or not self._recover_slot(nxt):
                    raise
        if base_version is not None and nxt != base_version + 1:
            # The table advanced past the snapshot this rewrite was derived
            # from; committing would erase the interleaved writer's commit.
            # Release the claim (readers never saw it) and make the caller
            # re-read + retry.
            try:
                os.unlink(self._manifest_path(nxt))
            except FileNotFoundError:
                pass
            raise ConcurrentWriteError(
                f"table {self.root} advanced to version {nxt - 1} after "
                f"this rewrite read version {base_version}; re-read and "
                "retry the mutation"
            )
        # Stats recorded by _write_segment during THIS attempt must not
        # outlive it: if the attempt aborts and another writer later claims
        # the same version slot and rewrites the same _segNNNNNN dir with
        # different data, a leftover pending entry would override the
        # correct stats at that writer's commit — and stale min/max makes
        # read(predicate=) silently skip segments that DO contain matching
        # rows. Snapshot the pending keys so the cleanup paths below can
        # discard exactly what this attempt added.
        pending_before = set(self._pending_stats)
        dv_pending_before = set(self._pending_dv)
        parts_pending_before = set(self._pending_parts)
        try:
            prev_txn, prev_stats, prev_dv = {}, {}, {}
            prev_cons, prev_gen = {}, {}
            prev_renames, prev_dropped = {}, []
            prev_parts: dict = {}
            prev_pby: list = list(self.partition_by)
            if cur is not None:
                with open(self._manifest_path(cur)) as f:
                    prev = json.load(f)
                prev_txn = prev.get("txn", {})
                prev_stats = prev.get("stats", {})
                prev_dv = prev.get("dv", {})
                prev_cons = prev.get("constraints", {})
                prev_gen = prev.get("generated", {})
                prev_renames = prev.get("renames", {})
                prev_dropped = prev.get("dropped", [])
                prev_parts = prev.get("partitions", {})
                prev_pby = prev.get("partition_by", [])
            new_txn = dict(prev_txn)
            if txn is not None:
                app, ver = txn
                new_txn[app] = max(int(ver), int(new_txn.get(app, -1)))
            segments = make_segments(nxt)
            # Per-segment stats: fresh for new segments, carried forward
            # for reused ones (the append case rewrites nothing).
            stats = {}
            for s in segments:
                st = self._pending_stats.pop(s, prev_stats.get(s))
                if st:
                    stats[s] = st
            # A written-but-unreferenced segment's stats are equally stale
            # the moment this commit lands — drop any unclaimed additions.
            for s in set(self._pending_stats) - pending_before:
                del self._pending_stats[s]
            # Per-segment partition values: same lifecycle as stats.
            parts = {}
            for s in segments:
                p = self._pending_parts.pop(s, prev_parts.get(s))
                if p is not None:
                    parts[s] = p
            for s in set(self._pending_parts) - parts_pending_before:
                del self._pending_parts[s]
            # Deletion vectors: carried forward by default — a dv masks
            # ONLY the exact segment names in its applies_to list, so a
            # rewrite that drops those segments makes the dv inert and the
            # housekeeping below removes it from the manifest. Restore
            # passes dv_override to pin the restored version's dv set.
            if dv_override is not None:
                dv = dict(dv_override)
            else:
                dv = dict(prev_dv)
                for name in set(self._pending_dv) - dv_pending_before:
                    dv[name] = self._pending_dv.pop(name)
            live = set(segments)
            dv = {
                n: ap for n, ap in dv.items() if any(s in live for s in ap)
            }
            tmp = self._manifest_path(nxt) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "segments": segments,
                        "meta": meta or {},
                        "txn": new_txn,
                        "stats": stats,
                        "dv": dv,
                        # Wall-clock commit time, the substrate for
                        # TIMESTAMP AS OF time travel. Informational only —
                        # version_at() monotonizes before resolving, so
                        # clock skew between writers can't reorder history.
                        "committed_at": time.time(),
                        # CHECK constraints ride in every manifest (carried
                        # forward like txn watermarks) so enforcement and
                        # external readers need no out-of-band state.
                        "constraints": (
                            prev_cons
                            if constraints_override is None
                            else constraints_override
                        ),
                        "generated": (
                            prev_gen
                            if generated_override is None
                            else generated_override
                        ),
                        # Column mapping (RENAME/DROP COLUMN): carried
                        # forward like constraints so every snapshot knows
                        # its own physical→logical translation.
                        "renames": (
                            prev_renames
                            if columns_override is None
                            else columns_override[0]
                        ),
                        "dropped": (
                            prev_dropped
                            if columns_override is None
                            else columns_override[1]
                        ),
                        # Partitioning: the column list is fixed at table
                        # creation and carried verbatim; per-segment values
                        # follow the stats lifecycle above.
                        "partition_by": prev_pby,
                        "partitions": parts,
                        # Advertised so external readers (the Python data
                        # source) can apply deletion vectors without being
                        # told the key column out of band. Writers that
                        # don't know the key (the format-writer commit
                        # path) carry the previous manifest's forward.
                        "key": self.key or (prev.get("key", "") if cur is not None else ""),
                    },
                    f,
                    default=str,  # dates/decimals degrade to strings
                )
            os.replace(tmp, self._manifest_path(nxt))
            self._swap_pointer(nxt)
            if self.write_cdf:
                # Post-pointer, so the commit is already durable; an error
                # here leaves a repairable gap (materialize_cdf(v) is
                # idempotent), never a broken table.
                self.materialize_cdf(nxt)
            return nxt
        except BaseException:
            # Release the claim: the slot must not stay wedged after a failed
            # segment write. Readers were never exposed (pointer unmoved).
            # Stats from this attempt's segment writes go too — the segment
            # dirs it wrote are orphans another claimant may legitimately
            # rewrite with different data.
            for s in set(self._pending_stats) - pending_before:
                del self._pending_stats[s]
            for n in set(self._pending_dv) - dv_pending_before:
                del self._pending_dv[n]
            for s in set(self._pending_parts) - parts_pending_before:
                del self._pending_parts[s]
            try:
                os.unlink(self._manifest_path(nxt))
            except FileNotFoundError:
                pass
            raise

    def vacuum(self, keep_last: int = 2, dry_run: bool = False) -> dict:
        """Drop manifests older than the newest ``keep_last`` versions and
        every segment no surviving manifest references. Files belonging to
        versions ABOVE the pointer are never touched: a zero-length file
        there is a concurrent writer's live claim (deleting it would break
        the put-if-absent mutual exclusion) and a finalized one is a commit
        awaiting its pointer swap.

        ``dry_run=True`` (Delta's VACUUM DRY RUN) deletes nothing and
        returns what a real run would reclaim. Both modes return
        ``{"names": [...], "n_files": int, "bytes": int}``."""
        cur = self.current_version()
        if cur is None:
            return {"names": [], "n_files": 0, "bytes": 0}
        keep_versions = [
            v for v in range(max(0, cur - keep_last + 1), cur + 1)
            if os.path.exists(self._manifest_path(v))
        ]
        live = {s for v in keep_versions for s in self._segments(v)}
        live_dv = set()
        for kv in keep_versions:
            with open(self._manifest_path(kv)) as f:
                live_dv |= set(json.load(f).get("dv", {}))
        doomed: list[str] = []
        for name in os.listdir(self.root):
            if m := _MANIFEST_RE.match(name):
                if int(m.group(1)) <= cur and int(m.group(1)) not in keep_versions:
                    doomed.append(name)
            elif (m := _SEG_RE.match(name)) and name not in live:
                if int(m.group(1)) <= cur:
                    doomed.append(name)
            elif m := _CDC_RE.match(name):
                # A change file lives exactly as long as its version: a
                # stream positioned before the retention window can't
                # resume anyway (its manifests are gone).
                if int(m.group(1)) <= cur and int(m.group(1)) not in keep_versions:
                    doomed.append(name)
            elif m := _DV_RE.match(name):
                # A deletion vector outlives its own version: it stays as
                # long as ANY retained manifest references it.
                if int(m.group(1)) <= cur and name not in live_dv:
                    doomed.append(name)
        n_files = size = 0
        for name in doomed:
            p = os.path.join(self.root, name)
            if os.path.isdir(p):
                for dirpath, _d, files in os.walk(p):
                    for fn in files:
                        n_files += 1
                        try:
                            size += os.path.getsize(os.path.join(dirpath, fn))
                        except OSError:
                            pass
            elif os.path.exists(p):
                n_files += 1
                size += os.path.getsize(p)
        if not dry_run:
            for name in doomed:
                p = os.path.join(self.root, name)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    try:
                        os.unlink(p)
                    except FileNotFoundError:
                        pass
        return {"names": sorted(doomed), "n_files": n_files, "bytes": size}

    # -- reads ----------------------------------------------------------------

    def _dv_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _read_segments(
        self, segments: list[str], dv: dict[str, list[str]]
    ) -> DataFrame:
        """Union the segments, applying deletion vectors with merge-on-read
        semantics: a dv's deleted keys mask ONLY the segments in its
        applies_to list, so rows re-inserted after the delete (they live in
        newer segments no dv covers) survive. Segments are grouped by the
        set of dvs covering them — one broadcast anti-join per group, and
        the group count is bounded by the dv count (compaction folds dvs
        away, resetting it)."""
        # mergeSchema: segments may carry evolved schemas (append with new
        # columns — see append's schema note); without it Spark takes ONE
        # segment's footer as the table schema and silently drops columns
        # the other segments added. Union semantics: missing columns read
        # as null, matching Delta's additive schema evolution.
        live_dv = {
            n: set(ap) & set(segments)
            for n, ap in dv.items()
            if set(ap) & set(segments)
        }
        if not live_dv:
            paths = [os.path.join(self.root, s) for s in segments]
            return self.spark.read.option("mergeSchema", "true").parquet(*paths)
        groups: dict[tuple[str, ...], list[str]] = {}
        for s in segments:
            key = tuple(sorted(n for n, ap in live_dv.items() if s in ap))
            groups.setdefault(key, []).append(s)
        parts = []
        for names, segs in groups.items():
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.root, s) for s in segs]
            )
            if names:
                keys = (
                    self.spark.read.parquet(
                        *[self._dv_path(n) for n in names]
                    )
                    .select(self.key)
                    .distinct()
                )
                # Deletes are small between compactions: broadcast the
                # keys so the anti-join never shuffles the data side.
                df = df.join(F.broadcast(keys), self.key, "left_anti")
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def read(
        self,
        version: int | None = None,
        predicate: dict | None = None,
        as_of=None,
    ) -> DataFrame:
        """Read a version. ``predicate`` maps stats-tracked columns to a
        scalar (equality) or ``(lo, hi)`` range (either bound None =
        unbounded): segments whose manifest min/max can't overlap are
        skipped before Spark ever lists their files — Delta-style data
        skipping at manifest scale, on top of parquet's own row-group
        pruning within the surviving segments. Equality predicates also
        probe per-segment Bloom sidecars when present (``bloom_cols``),
        which prunes point lookups even on unclustered layouts where every
        segment's min/max overlaps. The exact filter is still
        applied to the surviving rows, so
        ``read(predicate=p)`` ≡ ``read().filter(p)`` always; segments
        without stats (or columns not tracked) are conservatively kept.

        ``as_of`` (epoch seconds, datetime, or ISO-8601 string) is
        ``TIMESTAMP AS OF``: the snapshot is the latest version committed
        at or before that instant (see :meth:`version_at`). Mutually
        exclusive with ``version``."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass version= or as_of=, not both")
            version = self.version_at(as_of)
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        with open(self._manifest_path(v)) as f:
            manifest = json.load(f)
        segments = manifest["segments"]
        dv = manifest.get("dv", {})
        # Column mapping: the snapshot presents ITS OWN logical schema
        # (names as of version v, like Delta column mapping); predicates
        # arrive logical and translate to physical for stats, blooms, and
        # the stored files.
        renames = manifest.get("renames", {})
        dropped = manifest.get("dropped", [])
        inv = {log: phy for phy, log in renames.items()}
        predicate = (
            {inv.get(c, c): b for c, b in predicate.items()}
            if predicate and inv
            else predicate
        )
        cond = None
        if predicate:
            stats = manifest.get("stats", {})
            parts = manifest.get("partitions", {})
            segments = [
                s
                for s in segments
                if _segment_may_match(stats.get(s), predicate)
                and self._partition_may_match(parts.get(s), predicate)
            ]
            # Equality terms additionally probe bloom sidecars — effective
            # exactly where min/max is not (unclustered high-cardinality
            # keys). Range terms can't use a bloom.
            from lakehouse_spark.mutation.bloom import hash_values, probe_family

            for c, bounds in predicate.items():
                if isinstance(bounds, tuple):
                    continue
                fam = probe_family([bounds])
                hv = hash_values([bounds])
                if hv is None:
                    continue
                segments = [
                    s
                    for s in segments
                    if not self._bloom_rules_out(s, c, hv, fam)
                ]
            cond = _predicate_expr(predicate)

        def _logical(df: DataFrame) -> DataFrame:
            return self._to_logical_static(df, renames, dropped)

        if predicate and not segments:
            # Schema from the unpruned version.
            empty = self._read_segments(manifest["segments"], dv)
            out = empty if cond is None else empty.filter(cond)
            return _logical(out.limit(0))
        out = self._read_segments(segments, dv)
        if cond is None:
            return _logical(out)
        if any(c not in out.columns for c in predicate):
            # Pruning removed every segment that carried a schema-evolved
            # predicate column; the survivors can't even resolve the
            # filter. Fall back to the unpruned read so
            # read(predicate=p) ≡ read().filter(p) holds exactly
            # (correctness beats skipping in this rare case).
            full = self._read_segments(manifest["segments"], dv)
            return _logical(full.filter(cond))
        return _logical(out.filter(cond))

    # -- targeted DML: rewrite only the files the keys can live in -----------

    # Above this many distinct source keys, skip targeting: collecting the
    # key set to the driver would cost more than it saves, and a source that
    # large usually touches most files anyway. Delta's file-skipping DML has
    # the same shape (join the source against add-file stats; degrade to a
    # full rewrite when everything matches).
    max_targeted_keys = 200_000

    def _source_key_list(self, source: DataFrame) -> list | None:
        """Distinct non-null source keys, sorted, or None when the source is
        too large to target (caller falls back to the full rewrite). NULL
        keys never match the equi-join, so they can't identify a segment to
        rewrite — they ride along as inserts regardless."""
        rows = (
            source.select(self.key)
            .filter(F.col(self.key).isNotNull())
            .distinct()
            .limit(self.max_targeted_keys + 1)
            .collect()
        )
        if len(rows) > self.max_targeted_keys:
            return None
        return sorted(r[0] for r in rows)

    def _bloom_rules_out(self, seg: str, col: str, hashes, family) -> bool:
        """True when the segment's bloom sidecar PROVES none of the hashed
        values is present (no sidecar / non-probeable values / probe
        ``family`` not matching the sidecar's recorded value type → False:
        the segment stays). A bloom False is definitive — no false
        negatives — so ruling a segment out can never change results."""
        if hashes is None or hashes.size == 0:
            return False
        from lakehouse_spark.mutation.bloom import load_bloom, might_contain_any

        bloom = load_bloom(os.path.join(self.root, seg), col, family)
        if bloom is None:
            return False
        return not might_contain_any(bloom, hashes)

    def _split_by_key_overlap(
        self, manifest: dict, keys: list
    ) -> tuple[list[str], list[str]]:
        """Partition the manifest's segments into (touched, untouched):
        a segment is untouched only when its key min/max PROVABLY contains
        none of the source keys — then no source row can match a row in it,
        so the DML result leaves it byte-identical and the commit reuses it
        by reference. Segments without key stats (or with incomparable
        degraded types) are conservatively touched. Effective exactly when
        the layout clusters the key (compact(range_by=key) / z-order /
        naturally-ordered ingest keys) — the same precondition as Delta's
        stats-based file-skipping DML. Bloom sidecars (``bloom_cols``)
        extend the proof to UNCLUSTERED layouts: even when a segment's key
        range covers a source key, its bloom can still prove the exact
        keys absent."""
        import bisect

        from lakehouse_spark.mutation.bloom import hash_values, probe_family

        stats = manifest.get("stats", {})
        unset = object()
        hashes = unset  # hashed lazily, once, on the first bloom probe
        family = None
        touched: list[str] = []
        untouched: list[str] = []
        for s in manifest["segments"]:
            st = (stats.get(s) or {}).get(self.key)
            hit = True
            if st is not None and st[0] is not None and st[1] is not None:
                try:
                    i = bisect.bisect_left(keys, st[0])
                    hit = i < len(keys) and keys[i] <= st[1]
                except TypeError:  # degraded/incomparable stat types
                    hit = True
            if hit:
                if hashes is unset:
                    family = probe_family(keys)
                    hashes = hash_values(keys)
                if self._bloom_rules_out(s, self.key, hashes, family):
                    hit = False
            (touched if hit else untouched).append(s)
        return touched, untouched

    def _aligned_base(
        self, manifest: dict, touched: list[str]
    ) -> DataFrame:
        """Read the touched segments (deletion vectors applied) aligned to
        the FULL table schema, so targeted DML behaves byte-identically to
        the full-table form even when schema-evolved columns live only in
        untouched segments. Returned in LOGICAL column names (renames
        applied, dropped columns gone): every DML path computes in logical
        space and _write_segment translates back to physical on write —
        which is also what physically purges dropped columns from any
        segment a rewrite touches."""
        renames = manifest.get("renames", {})
        drop_cols = manifest.get("dropped", [])

        def _logical(df: DataFrame) -> DataFrame:
            return self._to_logical_static(df, renames, drop_cols)

        dv = manifest.get("dv", {})
        full = _logical(self._read_segments(manifest["segments"], dv))
        if set(touched) == set(manifest["segments"]):
            return full
        if not touched:
            return full.limit(0)
        base = _logical(self._read_segments(touched, dv))
        missing = [c for c in full.columns if c not in base.columns]
        if missing:
            base = base.select(
                "*",
                *[
                    F.lit(None).cast(full.schema[c].dataType).alias(c)
                    for c in missing
                ],
            )
        return base.select(*full.columns)

    def history(self) -> list[dict]:
        """Commit log, newest first: every retained version with its
        segment count, meta, and txn watermarks (the DESCRIBE HISTORY
        surface; vacuumed versions are absent)."""
        out = []
        v = self.current_version()
        if v is None:
            return out
        for i in range(v, -1, -1):
            try:
                with open(self._manifest_path(i)) as f:
                    m = json.load(f)
            except FileNotFoundError:  # vacuumed
                continue
            out.append(
                {
                    "version": i,
                    "n_segments": len(m["segments"]),
                    "meta": m.get("meta", {}),
                    "txn": m.get("txn", {}),
                    "committed_at": m.get("committed_at"),
                }
            )
        return out

    # -- timestamp time travel ----------------------------------------------

    def commit_timestamp(self, v: int) -> float:
        """Epoch seconds commit ``v`` landed. Reads the manifest's recorded
        ``committed_at``; manifests from before the field existed fall back
        to the file's mtime (exactly Delta's pre-ICT behavior, where
        TIMESTAMP AS OF resolved against commit-file modification times)."""
        with open(self._manifest_path(v)) as f:
            m = json.load(f)
        ts = m.get("committed_at")
        return float(ts) if ts is not None else os.stat(self._manifest_path(v)).st_mtime

    @staticmethod
    def _to_epoch(ts) -> float:
        """Accept epoch float/int, datetime, or ISO-8601 string."""
        if isinstance(ts, (int, float)):
            return float(ts)
        if isinstance(ts, str):
            try:
                return float(ts)  # numeric string (data-source option)
            except ValueError:
                pass
            from datetime import datetime

            return datetime.fromisoformat(ts).timestamp()
        return ts.timestamp()  # datetime / date-like

    def version_at(self, ts) -> int:
        """Latest retained version committed at or before ``ts`` — the
        resolution step behind ``TIMESTAMP AS OF``. Raw commit times are
        first made strictly increasing in version order (a commit whose
        clock reads EARLIER than its predecessor's is bumped to
        predecessor + 1ms, Delta's monotonization rule), so writer clock
        skew can never make time travel observe version n+1 while denying
        version n. Raises ValueError for a ``ts`` before the earliest
        retained commit (nothing to read there — Delta's
        ``timestampEarlierThanTableCreation``)."""
        head = self.current_version()
        if head is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        want = self._to_epoch(ts)
        eff_prev = None
        eff_first = None
        best = None
        for v in range(0, head + 1):
            try:
                raw = self.commit_timestamp(v)
            except FileNotFoundError:  # vacuumed
                continue
            eff = raw if eff_prev is None else max(raw, eff_prev + 0.001)
            eff_prev = eff
            if eff_first is None:
                eff_first = eff
            if eff <= want:
                best = v
        if best is None:
            raise ValueError(
                f"timestamp {ts!r} precedes the earliest retained commit "
                f"of {self.root}; earliest is {eff_first}"
            )
        return best

    def _cdc_path(self, v: int) -> str:
        return os.path.join(self.root, f"_cdc{v:06d}")

    def commit_kind(self, v: int) -> tuple[str, list[str]]:
        """Classify commit ``v`` from the manifests alone (no data read):
        ``("append", added_segments)`` when every prior segment is reused
        and deletion vectors are unchanged, ``("delete_dv", new_dv_names)``
        for a merge-on-read delete (segments untouched, dv added),
        ``("noop", [])`` for pointer-only commits (restore to an identical
        state), ``("rewrite", [])`` otherwise (upsert / merge / delete /
        overwrite / compact / mixed)."""
        with open(self._manifest_path(v)) as f:
            mv = json.load(f)
        cur_segs, cur_dv = mv["segments"], mv.get("dv", {})
        if v > 0:
            with open(self._manifest_path(v - 1)) as f:
                mp = json.load(f)
            prev_segs, prev_dv = set(mp["segments"]), mp.get("dv", {})
        else:
            prev_segs, prev_dv = set(), {}
        if prev_segs <= set(cur_segs):
            added = [s for s in cur_segs if s not in prev_segs]
            new_dv = [n for n in cur_dv if n not in prev_dv]
            lost_dv = [n for n in prev_dv if n not in cur_dv]
            if new_dv and not added and not lost_dv:
                return ("delete_dv", new_dv)
            if new_dv or lost_dv:
                return ("rewrite", [])  # mixed / dv removal: snapshot diff
            return ("append", added) if added else ("noop", [])
        return ("rewrite", [])

    def has_cdf(self, v: int) -> bool:
        """True when commit ``v``'s changes are readable without a snapshot
        diff: append/noop commits always are; rewrite commits once their
        ``_cdc`` dir is materialized."""
        return self.commit_kind(v)[0] != "rewrite" or os.path.isdir(
            self._cdc_path(v)
        )

    def materialize_cdf(self, v: int) -> bool:
        """Compute and store commit ``v``'s change file (idempotent; no-op
        for append/noop commits, which need none). Returns True when a
        ``_cdc`` dir exists after the call. Write is atomic (tmp dir +
        rename), so a concurrent reader never sees a partial change file.

        Requires manifest ``v-1`` (not yet vacuumed) on first
        materialization — the same retention constraint Delta places on
        CDF reads; once stored, the change file itself survives until
        :meth:`vacuum` drops version ``v``."""
        if self.commit_kind(v)[0] != "rewrite":
            return False
        dst = self._cdc_path(v)
        if os.path.isdir(dst):
            return True
        tmp = f"{dst}.tmp.{os.getpid()}.{threading.get_ident()}"
        self._changes_one(v).write.mode("overwrite").parquet(tmp)
        try:
            os.replace(tmp, dst)  # atomic publish; loser of a race cleans up
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(dst):
                raise
        return True

    def _changes_one(self, v: int) -> DataFrame:
        """Row-level changes of the single commit ``v`` — the keyed
        full-outer snapshot diff (see :meth:`changes` for semantics)."""

        def _fp(df: DataFrame):
            # Canonical row fingerprint: sorted-column JSON → xxhash64.
            # to_json drops null fields, so a column going null reads the
            # same as the column not existing — exactly the union-read
            # semantics of schema evolution (missing column ≡ null).
            return F.xxhash64(
                F.to_json(F.struct(*[F.col(c) for c in sorted(df.columns)]))
            )

        tag = F.lit(v).alias("_commit_version")
        prev, cur = self.read(v - 1), self.read(v)
        p = prev.select(
            F.col(self.key).alias("__k"),
            _fp(prev).alias("__fp_pre"),
            F.struct(*prev.columns).alias("__pre"),
        )
        c = cur.select(
            F.col(self.key).alias("__k"),
            _fp(cur).alias("__fp_post"),
            F.struct(*cur.columns).alias("__post"),
        )
        d = p.join(c, p["__k"].eqNullSafe(c["__k"]), "full_outer")
        changed = d.filter(
            F.col("__fp_pre").isNull()
            | F.col("__fp_post").isNull()
            | (F.col("__fp_pre") != F.col("__fp_post"))
        )
        pieces = []
        for side, when_other, ctype in (
            ("__pre", "__fp_post", "delete"),
            ("__post", "__fp_pre", "insert"),
        ):
            pieces.append(
                changed.filter(F.col(when_other).isNull())
                .select(f"{side}.*")
                .select("*", F.lit(ctype).alias("_change_type"), tag)
            )
        both = changed.filter(
            F.col("__fp_pre").isNotNull() & F.col("__fp_post").isNotNull()
        )
        for side, ctype in (
            ("__pre", "update_preimage"),
            ("__post", "update_postimage"),
        ):
            pieces.append(
                both.select(f"{side}.*")
                .select("*", F.lit(ctype).alias("_change_type"), tag)
            )
        out = pieces[0]
        for pc in pieces[1:]:
            out = out.unionByName(pc, allowMissingColumns=True)
        return out

    def changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Delta-style change data feed, computed on demand: every row-level
        change committed in versions ``from_version..to_version`` (both
        inclusive; ``to_version`` defaults to the head). Output = the table
        columns plus ``_change_type`` ('insert' / 'delete' /
        'update_preimage' / 'update_postimage') and ``_commit_version``.

        Cost shape per version step, chosen from the manifests alone:

        - **append commits** (every prior segment reused) are O(new rows):
          the added segments ARE the inserts — read just them, no join, no
          old-data scan. A 100 TB table ingesting via appends gets its
          change feed for free.
        - **rewrite commits** (upsert / merge / delete / restore /
          overwrite) pay one keyed full-outer diff of the two adjacent
          snapshots — a single shuffle join on the key, the same O(table)
          the rewrite itself paid. Row identity is null-safe on the key;
          changed-ness compares a canonical JSON fingerprint of each side's
          full row, so schema-evolved columns count as changes.
        - **no-op rewrites** (compact / OPTIMIZE / a restore to an
          identical state) emit nothing — layout changes are not data
          changes, exactly like Delta's CDF.

        Relationship to :meth:`diff`: diff compares exactly TWO versions
        with multiset except-both-ways semantics (no per-commit
        attribution, duplicates surface as count changes); changes walks
        every commit in the range and attributes each row-level change to
        its commit with update pre/post images — Delta's
        ``table_changes(...)`` contract. The rewrite-diff path assumes the
        store's keyed contract (one row per key per snapshot); duplicate
        keys introduced by raw appends are fine on the append path but
        would fan out a rewrite diff.

        Raises FileNotFoundError if a needed manifest was vacuumed: the
        feed needs version v-1 to describe v (Delta has the same
        retention-window constraint on CDF reads) — unless the commit's
        change file was materialized (``write_cdf=True`` or
        :meth:`materialize_cdf`), in which case the stored file is read
        directly."""
        head = self.current_version()
        if head is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        to_version = head if to_version is None else to_version
        if not 0 <= from_version <= to_version <= head:
            raise ValueError(
                f"invalid change range [{from_version}, {to_version}] "
                f"(head is {head})"
            )

        pieces: list[DataFrame] = []
        for v in range(from_version, to_version + 1):
            tag = F.lit(v).alias("_commit_version")
            kind, added = self.commit_kind(v)
            if kind == "noop":
                continue  # pointer-only commit (e.g. restore to self)
            if kind == "delete_dv":
                # The dv file IS the delete pre-image set — O(deleted) read.
                # _to_logical: stored files carry names as written
                # (physical for segments; dv/cdc carry write-time names),
                # the feed speaks the current logical schema.
                rows = self._to_logical(
                    self.spark.read.option("mergeSchema", "true").parquet(
                        *[self._dv_path(n) for n in added]
                    )
                )
                pieces.append(
                    rows.select("*", F.lit("delete").alias("_change_type"), tag)
                )
                continue
            if kind == "append":
                inserts = self._to_logical(
                    self.spark.read.option("mergeSchema", "true").parquet(
                        *[os.path.join(self.root, s) for s in added]
                    )
                )
                pieces.append(
                    inserts.select(
                        "*", F.lit("insert").alias("_change_type"), tag
                    )
                )
                continue
            if os.path.isdir(self._cdc_path(v)):
                # Stored change file: O(changes) read, no snapshot diff —
                # and usable even after manifest v-1 was vacuumed.
                pieces.append(
                    self._to_logical(self.spark.read.parquet(self._cdc_path(v)))
                )
                continue
            pieces.append(self._changes_one(v))
        if not pieces:
            empty = self.read(to_version).limit(0)
            return empty.select(
                "*",
                F.lit("insert").alias("_change_type"),
                F.lit(to_version).alias("_commit_version"),
            ).limit(0)
        out = pieces[0]
        for pc in pieces[1:]:
            out = out.unionByName(pc, allowMissingColumns=True)
        return out

    def exists(self) -> bool:
        return self.current_version() is not None

    # -- writes ----------------------------------------------------------------

    def init(
        self,
        df: DataFrame,
        meta: dict | None = None,
        txn: tuple[str, int] | None = None,
    ) -> None:
        self._transact(lambda v: self._write_partitioned(df, v), meta, txn)

    def append(
        self,
        rows: DataFrame,
        meta: dict | None = None,
        txn: tuple[str, int] | None = None,
    ) -> None:
        """SC4: append-only log write (the reference's open(...,'a')).
        O(new rows): one new segment, prior segments reused by reference.
        Safe under concurrent writers: the version slot is claimed before
        the segment write, so a racing append raises
        :class:`ConcurrentWriteError` instead of dropping a segment.
        ``txn=(app_id, version)`` stamps an exactly-once watermark (see
        :meth:`last_txn_version`)."""
        if not self.exists():
            self.init(rows, meta, txn)
            return
        rows = self._apply_generated(rows)
        self._reject_schema_conflicts(rows)
        # Prior segments are resolved INSIDE the claimed transaction: once
        # v is claimed, v-1 is immutable (no other writer can advance it).
        self._transact(
            lambda v: self._segments(v - 1) + self._write_partitioned(rows, v),
            meta,
            txn,
        )

    def _reject_schema_conflicts(self, rows: DataFrame, op: str = "append") -> None:
        """Schema enforcement (Delta's write-time contract): a written
        column whose TYPE differs from the table's poisons the shared
        parquet schema merge — every later read of every row would fail at
        scan planning, far from the write that caused it. Reject at the
        write instead (every DML path: append, upsert, merge,
        overwrite_where). New columns pass (additive evolution: old
        segments read them as null); missing columns pass (the new segment
        reads nulls for them); only same-name/different-type conflicts
        raise."""
        # simpleString drops nullability (recursively) on purpose: writing
        # non-null arrays/structs into nullable ones is exactly what
        # parquet's schema merge already reconciles — only TYPE conflicts
        # poison the merge.
        target = {f.name: f.dataType.simpleString() for f in self.read().schema}
        conflicts = [
            (f.name, target[f.name], f.dataType.simpleString())
            for f in rows.schema
            if f.name in target and target[f.name] != f.dataType.simpleString()
        ]
        if conflicts:
            detail = "; ".join(
                f"{n}: table={t} vs source={a}" for n, t, a in conflicts
            )
            raise SchemaMismatchError(
                f"{op} to {self.root} changes column type(s) [{detail}]; "
                "cast the input, or overwrite() to redefine the schema"
            )

    def version_meta(self, version: int | None = None) -> dict:
        """The ``meta`` dict committed with a version (empty for versions
        written before metadata existed, or when none was given)."""
        v = self.current_version() if version is None else version
        if v is None:
            return {}
        with open(self._manifest_path(v)) as f:
            return json.load(f).get("meta", {})

    def last_txn_version(self, app_id: str) -> int:
        """Max txn version ever committed for ``app_id`` (-1 if none) — read
        from the HEAD manifest, which carries every app's watermark forward
        through all commit types (Delta's ``txnVersion`` lookup). Streaming
        sinks compare their batch id against this to stay idempotent across
        interleaved non-stream commits, other streams, and vacuum."""
        v = self.current_version()
        if v is None:
            return -1
        with open(self._manifest_path(v)) as f:
            return int(json.load(f).get("txn", {}).get(app_id, -1))

    def _rewrite(
        self,
        df: DataFrame,
        txn: tuple[str, int] | None = None,
        base_version: int | None = None,
    ) -> int:
        """Full compaction commit: one segment holding ``df``."""
        return self._transact(
            lambda v: self._write_partitioned(df, v),
            txn=txn,
            base_version=base_version,
        )

    def restore(self, version: int | None = None, as_of=None) -> int:
        """Delta-style RESTORE: roll the table back to ``version`` by
        committing a NEW version that references the old version's
        segments — history is preserved (the bad commits stay inspectable
        and the restore itself is an auditable commit with provenance
        meta), nothing is rewritten, and concurrent-writer safety is the
        ordinary claim protocol. Fails if ``version`` was vacuumed.
        ``as_of`` restores to the snapshot live at that instant
        (``RESTORE TABLE ... TO TIMESTAMP AS OF``)."""
        if (version is None) == (as_of is None):
            raise ValueError("pass exactly one of version= or as_of=")
        if as_of is not None:
            version = self.version_at(as_of)
        with open(self._manifest_path(version)) as f:  # raises if vacuumed
            m = json.load(f)
        return self._transact(
            lambda v: m["segments"],
            meta={"restored_from": version},
            # Pin the restored version's deletion vectors too: carrying the
            # head's dvs would keep masking rows the restored state had.
            dv_override=m.get("dv", {}),
        )

    def overwrite(
        self,
        df: DataFrame,
        meta: dict | None = None,
        txn: tuple[str, int] | None = None,
    ) -> None:
        """Full-replace commit (CREATE OR REPLACE): the new version holds
        exactly ``df``, with ``meta`` riding in the manifest. The refresh
        primitive for derived tables (materialized views) that must record
        provenance — e.g. which base version they reflect — atomically with
        their data."""
        df = self._apply_generated(df)
        self._transact(lambda v: self._write_partitioned(df, v), meta, txn)

    def overwrite_where(
        self,
        df: DataFrame,
        predicate: dict,
        meta: dict | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Delta's ``replaceWhere`` / dynamic-partition-overwrite: atomically
        replace exactly the rows matching ``predicate`` (same dict form as
        :meth:`read` — scalar equality or ``(lo, hi)`` ranges over
        stats-tracked columns) with ``df``. The idempotent-backfill
        primitive: re-running a day's pipeline swaps that day's rows in one
        commit, whatever state the previous run left.

        Every row of ``df`` must itself satisfy the predicate — writing
        outside the replaced region raises ValueError before anything
        commits, exactly Delta's "data would be written outside of
        replaceWhere" check.

        Cost shape: **O(affected segments)** — segments whose stats can't
        overlap the predicate are reused by reference; only overlapping
        segments are read, filtered to their surviving (non-matching) rows,
        and rewritten together with ``df``. On a layout banded by the
        predicate column (compact(range_by=...) / z-order), a daily backfill
        touches one band, not the table. Returns the new version."""
        df = self._apply_generated(df)
        self._reject_schema_conflicts(df, op="overwrite_where")
        cond = _predicate_expr(predicate)
        if cond is None:
            raise ValueError(
                "empty predicate would replace the whole table; call "
                "overwrite() for that"
            )
        bad = df.filter(~F.coalesce(cond, F.lit(False))).limit(1)
        if bad.count():
            raise ValueError(
                f"replacement rows fall outside the predicate {predicate!r} "
                "(Delta's replaceWhere rejects this too) — fix the source "
                "or widen the predicate"
            )
        v0 = self.current_version()
        if v0 is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        with open(self._manifest_path(v0)) as f:
            manifest = json.load(f)
        stats = manifest.get("stats", {})
        # Stats are keyed by PHYSICAL column names; the predicate arrives
        # logical. (The row-level cond below stays logical — the base read
        # is logical too.)
        phys_pred = self._pred_to_physical(predicate)
        # Partition-value pruning joins footer stats in the touched-segment
        # test: date/timestamp partition columns get no footer stats (only
        # int/float/string are harvested), so without _partition_may_match
        # a partition-predicate replaceWhere on a date-partitioned table
        # rewrites every segment — correct but O(table), not O(affected).
        parts = manifest.get("partitions", {})
        touched = [
            s
            for s in manifest["segments"]
            if _segment_may_match(stats.get(s), phys_pred)
            and self._partition_may_match(parts.get(s), phys_pred)
        ]
        untouched = [s for s in manifest["segments"] if s not in set(touched)]
        base = self._aligned_base(manifest, touched)
        # Survivors = rows NOT matching (a null-valued predicate column
        # means "doesn't match" and therefore survives).
        survivors = base.filter(~F.coalesce(cond, F.lit(False)))
        out = survivors.unionByName(df.select(*base.columns))
        return self._transact(
            lambda v: untouched + self._write_partitioned(out, v),
            meta,
            txn,
            base_version=v0,
        )

    def upsert(
        self,
        rows: DataFrame,
        txn: tuple[str, int] | None = None,
        mode: str = "rewrite",
        base_version: int | None = None,
    ) -> None:
        """SC5: whole-row upsert keyed by ``self.key`` — the atomic
        tmp+rename document replace. Delta form: MERGE WHEN MATCHED UPDATE
        WHEN NOT MATCHED INSERT. ``txn`` stamps an exactly-once watermark
        (see :meth:`last_txn_version`).

        ``mode="rewrite"`` (default) cost shape: **O(affected files), not
        O(table)** when the key is in ``stats_cols`` and the layout
        clusters it — segments whose key range provably contains no source
        key are reused by reference; only the overlapping files are read,
        merged, and rewritten (Delta's file-skipping MERGE). Unclustered
        layouts or >200k source keys degrade gracefully to the full
        rewrite.

        ``mode="dv"`` is **merge-on-read MERGE** (Delta's deletion-vector
        DML): NO segment is rewritten at all — the commit writes the
        source rows as one new segment and a deletion vector masking the
        OLD images of the matched keys in exactly the segments they could
        live in. Cost: O(matched pre-images + source rows) written,
        whatever the table size; reads pay one extra broadcast anti-join
        per outstanding dv until :meth:`compact`/:meth:`maybe_compact`
        folds them (run on a cadence, like Delta's OPTIMIZE after DV
        DML)."""
        if mode not in ("rewrite", "dv"):
            raise ValueError(f"mode must be 'rewrite' or 'dv', got {mode!r}")
        if not self.exists():
            self.init(rows, txn=txn)
            return
        rows = self._apply_generated(rows)
        self._reject_schema_conflicts(rows, op="upsert")
        # base_version lets a caller whose SOURCE was derived from a pinned
        # snapshot (update(): post-images computed from read(v0)) extend the
        # snapshot-conflict check back to that read — a commit landing after
        # the derivation raises instead of silently losing it.
        v0 = self.current_version() if base_version is None else base_version
        with open(self._manifest_path(v0)) as f:
            manifest = json.load(f)
        keys = self._source_key_list(rows)
        if keys is None:
            touched, untouched = manifest["segments"], []
        else:
            touched, untouched = self._split_by_key_overlap(manifest, keys)
        base = self._aligned_base(manifest, touched)
        if mode == "dv":
            new_rows = rows.select(*base.columns)
            # Pre-images of the keys being replaced: they fund the change
            # feed's delete/update records AND define the read-time mask.
            matched = base.join(
                F.broadcast(new_rows.select(self.key).distinct()),
                self.key,
                "left_semi",
            )
            has_matches = bool(touched) and matched.limit(1).count() > 0

            def _mor(v: int) -> list[str]:
                segs = self._segments(v - 1)
                new_segs = self._write_partitioned(new_rows, v)
                if has_matches:
                    name = f"_dv{v:06d}"
                    matched.write.mode("overwrite").parquet(
                        self._dv_path(name)
                    )
                    # Scoped to the touched segments only: the mask never
                    # has to be tested against files the keys provably
                    # aren't in — fewer read-time anti-join groups.
                    self._pending_dv[name] = list(touched)
                return segs + new_segs

            self._transact(_mor, txn=txn, base_version=v0)
            return
        survivors = base.join(rows.select(self.key), self.key, "left_anti")
        out = survivors.unionByName(rows.select(*base.columns))
        self._transact(
            lambda v: untouched + self._write_partitioned(out, v),
            txn=txn,
            base_version=v0,
        )

    def update(
        self,
        set: dict[str, str],
        where: str | None = None,
        predicate: dict | None = None,
        mode: str = "rewrite",
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Delta's ``UPDATE target SET <col> = <expr> [WHERE ...]``.

        ``set`` maps column names to SQL expressions evaluated per matched
        row (``{"x": "x + 1", "status": "'done'"}``). ``where`` is a SQL
        boolean over the row; ``predicate`` is the :meth:`read` dict form of
        (part of) the same condition and is what buys file skipping — a
        predicate over stats/partition/bloom-tracked columns means only the
        segments that can hold matches are even read, and the key-targeted
        rewrite underneath touches only the files the matched keys live in.
        ``mode="dv"`` is merge-on-read UPDATE: zero rewrites, old images
        masked by a deletion vector, post-images in one new segment.

        Generated columns are recomputed from the updated values (Delta's
        UPDATE contract); setting one directly, or the key, is an error.
        Returns the number of updated rows. Concurrency: derived from a
        pinned snapshot and committed with snapshot-conflict detection —
        an interleaved commit raises :exc:`ConcurrentWriteError`."""
        v0 = self.current_version()
        if v0 is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        key = self.key or self._manifest_key()
        gen = self.generated_columns()
        cols = self.read(v0).columns
        for c in set:
            if c == key:
                raise ValueError(
                    f"cannot UPDATE the key column {key!r}; delete + insert "
                    "to change a row's identity"
                )
            if c in gen:
                raise ValueError(
                    f"column {c!r} is generated ({gen[c]}); update its "
                    "source columns and the formula recomputes it"
                )
            if c not in cols:
                raise KeyError(f"no column {c!r} (have {cols})")
        matched = self.read(v0, predicate=predicate)
        if where is not None:
            matched = matched.filter(F.expr(where))
        # SET expressions are cast to the column's existing type (Delta's
        # store-assignment rule): UPDATE changes values, never the schema.
        types = {f.name: f.dataType for f in matched.schema}
        post = matched.select(
            *[
                F.expr(set[c]).cast(types[c]).alias(c) if c in set else F.col(c)
                for c in matched.columns
            ]
        )
        if gen:  # recompute from the post-update values
            post = post.drop(*[c for c in gen if c in post.columns])
        post = post.persist()
        try:
            n = post.count()
            if n:
                self.upsert(post, txn=txn, mode=mode, base_version=v0)
            return n
        finally:
            post.unpersist()

    def merge(
        self,
        source: DataFrame,
        update_cols: list[str] | None = None,
        update_cond: str | None = None,
        delete_cond: str | None = None,
        insert: bool = True,
        txn: tuple[str, int] | None = None,
        extra_cols: str = "error",
        mode: str = "rewrite",
    ) -> None:
        """Conditional MERGE keyed by ``self.key`` — the full Delta shape
        :meth:`upsert` is the unconditional special case of::

            MERGE INTO target t USING source s ON t.<key> = s.<key>
            WHEN MATCHED [AND <delete_cond>] THEN DELETE
            WHEN MATCHED [AND <update_cond>] THEN UPDATE SET <update_cols>
            WHEN NOT MATCHED [AND insert]    THEN INSERT *

        ``update_cond`` / ``delete_cond`` are SQL boolean expressions over
        ``t.<col>`` (current row) and ``s.<col>`` (incoming row); DELETE
        is evaluated before UPDATE, matching Delta's clause ordering.
        ``update_cols`` limits which target columns the update rewrites
        (default: every source column except the key). Unmatched target
        rows always survive; unmatched source rows insert when ``insert``.

        Source columns the target schema lacks are an error by default —
        Delta's MERGE rejects unknown columns rather than silently
        discarding their data. ``extra_cols`` picks the policy:
        ``"error"`` (default) raises; ``"evolve"`` widens the target
        schema Delta-autoMerge-style (existing rows read null for the new
        columns, matched updates and inserts carry them); ``"ignore"``
        explicitly discards them.

        Cost shape: one left-outer join against the (usually small) source
        plus a rewrite of **only the segments whose key stats can contain a
        source key** (untouched segments are reused by reference) — Delta's
        file-skipping MERGE. On a key-clustered layout that's O(affected
        files); without key stats or with >200k source keys it degrades to
        the classic O(table) rewrite.

        ``mode="dv"`` is merge-on-read MERGE (see :meth:`upsert`): NO
        segment is rewritten — deleted and updated rows' OLD images are
        masked by a deletion vector scoped to the segments they can live
        in, and one new segment carries the update post-images plus the
        inserts. Matched rows that neither clause touches stay in their
        original segments unmasked. O(changed + inserted rows) written."""
        if extra_cols not in ("error", "ignore", "evolve"):
            raise ValueError(
                f"extra_cols must be 'error', 'evolve' or 'ignore', got {extra_cols!r}"
            )
        if mode not in ("rewrite", "dv"):
            raise ValueError(f"mode must be 'rewrite' or 'dv', got {mode!r}")
        # Generated columns the source omits are computed up front so
        # INSERTs carry them; an UPDATE whose clause leaves a generated
        # column stale is caught by the write-time enforcement instead.
        source = self._apply_generated(source)
        # NULL keys never satisfy the equi-join, so they cannot fan a
        # matched target row out — exclude them from the duplicate check
        # (two null-key source rows are legal; with insert=True each
        # simply inserts, the standard MERGE outcome for unmatched rows).
        dup = (
            source.filter(F.col(self.key).isNotNull())
            .groupBy(self.key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
        )
        if dup.count():
            k = dup.collect()[0][self.key]
            raise ValueError(
                f"merge source has multiple rows for key {k!r}; a duplicate "
                "key would fan matched target rows out (Delta raises "
                "'multiple source rows matched' here too) — dedupe the "
                "source first"
            )
        if not self.exists():
            if insert:
                self.init(source, txn=txn)
            return
        self._reject_schema_conflicts(source, op="merge")
        # Targeted rewrite (see upsert): only segments whose key stats can
        # contain a source key are read and rewritten; the rest are reused
        # by reference. The aligned base carries the FULL table schema, so
        # the unknown-column check and clause evaluation below are
        # byte-identical to the untargeted form.
        v0 = self.current_version()
        with open(self._manifest_path(v0)) as f:
            manifest = json.load(f)
        tkeys = self._source_key_list(source)
        if tkeys is None:
            touched, untouched = manifest["segments"], []
        else:
            touched, untouched = self._split_by_key_overlap(manifest, tkeys)
        base = self._aligned_base(manifest, touched)
        unknown = [c for c in source.columns if c not in base.columns]
        if unknown and extra_cols == "error":
            raise ValueError(
                f"merge source has columns {unknown} absent from the "
                "target schema; their data would be silently dropped on "
                "both the UPDATE and INSERT paths. Pass "
                "extra_cols='evolve' to widen the target schema, or "
                "extra_cols='ignore' to discard them explicitly"
            )
        if unknown and extra_cols == "evolve":
            # Schema evolution: widen the target with the new columns
            # (null for every existing row) BEFORE the join, so the
            # ordinary update/insert machinery below carries them — the
            # same additive semantics as Delta's
            # spark.databricks.delta.schema.autoMerge.
            base = base.select(
                "*",
                *[
                    F.lit(None).cast(source.schema[c].dataType).alias(c)
                    for c in unknown
                ],
            )
        cols = base.columns
        upd = [
            c
            for c in (update_cols if update_cols is not None else source.columns)
            if c != self.key and c in cols and c in source.columns
        ]
        t = base.alias("t")
        s = source.alias("s")
        joined = t.join(
            s, F.col(f"t.{self.key}") == F.col(f"s.{self.key}"), "left"
        )
        matched = F.col(f"s.{self.key}").isNotNull()
        if delete_cond is not None:
            deleted = matched & F.coalesce(F.expr(delete_cond), F.lit(False))
        else:
            deleted = F.lit(False)
        updated = matched & ~deleted
        if update_cond is not None:
            updated = updated & F.coalesce(F.expr(update_cond), F.lit(False))
        ins = None
        if insert:
            new_rows = s.join(
                t.select(F.col(f"t.{self.key}")),
                F.col(f"s.{self.key}") == F.col(f"t.{self.key}"),
                "left_anti",
            )
            missing = [c for c in cols if c not in source.columns]
            ins = new_rows.select(
                *[
                    F.col(c).alias(c)
                    if c in source.columns
                    else F.lit(None).alias(c)
                    for c in cols
                ]
            )
            if missing:
                ins = ins.select(
                    *[
                        F.col(c).cast(base.schema[c].dataType).alias(c)
                        for c in cols
                    ]
                )
        if mode == "dv":
            # Merge-on-read: old images of deleted/updated rows are masked
            # (their pre-images fund the dv file), update post-images and
            # inserts land in one new segment, and every matched-but-
            # untouched row stays in its original segment unmasked.
            pre = joined.filter(deleted | updated).select(
                *[F.col(f"t.{c}").alias(c) for c in cols]
            )
            post = joined.filter(updated).select(
                *[
                    F.when(updated, F.col(f"s.{c}"))
                    .otherwise(F.col(f"t.{c}"))
                    .alias(c)
                    if c in upd
                    else F.col(f"t.{c}").alias(c)
                    for c in cols
                ]
            )
            new_seg_rows = post if ins is None else post.unionByName(ins)
            has_masks = bool(touched) and pre.limit(1).count() > 0

            def _mor(v: int) -> list[str]:
                segs = self._segments(v - 1)
                new_segs = self._write_partitioned(new_seg_rows, v)
                if has_masks:
                    name = f"_dv{v:06d}"
                    pre.write.mode("overwrite").parquet(self._dv_path(name))
                    self._pending_dv[name] = list(touched)
                return segs + new_segs

            self._transact(_mor, txn=txn, base_version=v0)
            return
        kept = joined.filter(~deleted).select(
            *[
                F.when(updated, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                if c in upd
                else F.col(f"t.{c}").alias(c)
                for c in cols
            ]
        )
        out = kept if ins is None else kept.unionByName(ins)
        self._transact(
            lambda v: untouched + self._write_partitioned(out, v),
            txn=txn,
            base_version=v0,
        )

    def delete_keys(self, keys: DataFrame, mode: str = "rewrite") -> int:
        """J4 target: delete all rows whose key appears in ``keys`` (feed
        with plans.closure.cascade_delete_targets for recursive deletes).

        ``mode="rewrite"`` (default) compacts the survivors into one
        segment — O(table) write, zero read-time cost after.

        ``mode="dv"`` is the merge-on-read path (Delta deletion vectors):
        the commit WRITES only the deleted rows (their full pre-images, so
        the change feed reads them back for free) into a ``_dv`` file
        scoped to the segments live at delete time; the table's segments
        are untouched. Reads anti-join the (broadcast-small) deleted keys
        against exactly those segments — keys re-inserted later land in
        newer segments no dv covers and correctly resurrect. Cost shape:
        delete writes O(deleted rows) instead of rewriting 100 TB; reads
        pay one broadcast anti-join per outstanding dv until
        :meth:`compact` folds them away. Run compaction on a cadence,
        exactly like Delta's OPTIMIZE after DML on deletion-vector
        tables."""
        if mode not in ("rewrite", "dv"):
            raise ValueError(f"mode must be 'rewrite' or 'dv', got {mode!r}")
        v0 = self.current_version()
        if v0 is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        with open(self._manifest_path(v0)) as f:
            manifest = json.load(f)
        keyset = keys.select(self.key).distinct()
        # Deleted rows can only live in segments whose key stats overlap the
        # key set — read (and in rewrite mode, rewrite) just those.
        klist = self._source_key_list(keyset)
        if klist is None:
            touched, untouched = manifest["segments"], []
        else:
            touched, untouched = self._split_by_key_overlap(manifest, klist)
        if not touched:
            return 0  # provably nothing to delete; no commit needed
        base = self._aligned_base(manifest, touched)
        if mode == "rewrite":
            out = base.join(keyset, self.key, "left_anti")
            removed = base.count() - out.count()
            self._transact(
                lambda v: untouched + self._write_partitioned(out, v),
                base_version=v0,
            )
            return removed
        deleted = base.join(F.broadcast(keyset), self.key, "left_semi")
        removed = deleted.count()
        if removed == 0:
            return 0
        def _keep(v: int) -> list[str]:
            # applies_to resolved INSIDE the claimed transaction (v-1 is
            # immutable once v is claimed), like append's segment list.
            segs = self._segments(v - 1)
            name = f"_dv{v:06d}"
            deleted.write.mode("overwrite").parquet(self._dv_path(name))
            self._pending_dv[name] = segs
            return segs

        # base_version pins the dv's pre-images to the segment list they
        # were computed from — a commit landing between the read above and
        # the claim would make applies_to describe the wrong snapshot.
        self._transact(_keep, base_version=v0)
        return removed

    def delete_last_per_group(self, group: str, order_col: str) -> None:
        """O9 ← manager.py:293-325: drop the newest row per group (the
        reference's delete-last-transcript-line, as a versioned rewrite)."""
        v0 = self.current_version()
        base = self.read(v0)
        w = Window.partitionBy(group).orderBy(F.desc(order_col))
        out = (
            base.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .drop("__rn")
        )
        self._rewrite(out, base_version=v0)

    def retention_sweep(
        self, ended_col: str, created_col: str, cutoff
    ) -> int:
        """F2 cleanup ← manager.py:472-498: delete rows with
        coalesce(ended, created) < cutoff; returns removed count (A7)."""
        v0 = self.current_version()
        base = self.read(v0)
        keep = base.filter(
            ~(F.coalesce(F.col(ended_col), F.col(created_col)) < F.lit(cutoff))
        )
        removed = base.count() - keep.count()
        self._rewrite(keep, base_version=v0)
        return removed

    def compact(
        self,
        zorder_by: tuple[str, str] | None = None,
        bits: int = 8,
        n_segments: int = 8,
        range_by: str | None = None,
    ) -> int:
        """OPTIMIZE analog: fold all live segments into one (append-heavy
        tables accumulate small segments; run this on a cadence).

        ``zorder_by=(col_a, col_b)`` is OPTIMIZE ZORDER BY: rows are
        Morton-clustered on the two columns (operators.layout) and written
        as ``n_segments`` z-range-banded segments instead of one. Each
        band covers a compact rectangle of the 2-D key space, so with the
        same columns in ``stats_cols`` the manifest's per-segment min/max
        lets ``read(predicate=...)`` skip most bands on a box predicate
        over EITHER column — manifest-level data skipping on top of the
        parquet row-group pruning the z-sort already buys. One full
        rewrite, same as Delta's OPTIMIZE; the banded writes read the keyed
        snapshot from a persisted cache, not n_segments recomputes of
        upstream lineage.

        ``range_by=col`` is single-column range clustering (any orderable
        type, strings included): rows land in ``n_segments`` contiguous
        bands of the column's value space, cut at sampled quantiles. This
        is the layout that makes the targeted-DML and
        :meth:`overwrite_where` paths O(affected files): after
        ``compact(range_by=key)``, a merge/upsert/delete whose source keys
        fall in one band rewrites one band."""
        if zorder_by is not None and range_by is not None:
            raise ValueError("pass zorder_by or range_by, not both")
        v0 = self.current_version()
        pcols = self.partition_cols()
        if pcols and zorder_by is not None:
            raise ValueError(
                "zorder_by compaction is not supported on a partitioned "
                f"table (partition_by={list(pcols)}); use "
                "compact(range_by=...) to key-cluster within each partition"
            )
        if pcols:
            return self._compact_partitions(
                v0, range_by=range_by, n_segments=n_segments
            )
        if zorder_by is None and range_by is None:
            return self._rewrite(self.read(v0), base_version=v0)
        base = self.read(v0)
        if range_by is not None:
            keyed = base.withColumn("__z", F.col(range_by)).persist()
        else:
            from lakehouse_spark.operators.layout import zorder_key

            a, b = zorder_by
            keyed = base.withColumn(
                "__z", zorder_key(base, a, b, bits)
            ).persist()
        try:
            n = max(1, n_segments)
            if range_by is not None:
                # Generic-type cut points from a bounded sample (
                # approxQuantile is numeric-only; a sorted ~100k-row sample
                # gives band edges for strings/dates too — edges shape
                # layout, never results, so sampling error only skews band
                # sizes).
                total = keyed.count()
                frac = min(1.0, 100_000 / max(total, 1))
                sample = sorted(
                    r[0]
                    for r in keyed.select("__z")
                    .dropna()
                    .sample(fraction=frac, seed=7)
                    .collect()
                )
                qs = (
                    [sample[len(sample) * i // n] for i in range(1, n)]
                    if sample
                    else []
                )
            else:
                qs = keyed.approxQuantile(
                    "__z", [i / n for i in range(1, n)], 0.001
                )
            bounds = sorted(set(qs))
            edges = [None, *bounds, None]  # half-open bands, ends unbounded

            def _bands(v: int) -> list[str]:
                segs = []
                for i in range(len(edges) - 1):
                    lo, hi = edges[i], edges[i + 1]
                    band = keyed
                    if lo is not None:
                        band = band.filter(F.col("__z") >= lo)
                    if hi is not None:
                        # NULL z (null zorder column) fails every range
                        # filter — route null rows into the FIRST band so
                        # the rewrite never loses them (Delta ZORDER keeps
                        # null rows too).
                        cond = F.col("__z") < hi
                        if lo is None:
                            cond = cond | F.col("__z").isNull()
                        band = band.filter(cond)
                    band = band.sortWithinPartitions("__z").drop("__z")
                    segs.append(self._write_segment(band, v, part=i))
                return segs

            meta = (
                {"range_by": range_by}
                if range_by is not None
                else {"zorder_by": list(zorder_by)}
            )
            return self._transact(_bands, meta=meta, base_version=v0)
        finally:
            keyed.unpersist()

    def _compact_partitions(
        self, v0: int, range_by: str | None = None, n_segments: int = 8
    ) -> int:
        """Partition-wise OPTIMIZE: fold each partition's segments, reading
        only that partition's files (never a cross-partition shuffle — at
        100 TB a partition is the unit of maintenance, like Delta's
        OPTIMIZE WHERE). Deletion vectors are applied during the fold and
        retired. Without ``range_by``, each partition folds to one segment
        and single-segment partitions with no outstanding dv are reused by
        reference (a no-op partition costs zero IO). With ``range_by``,
        each partition is rewritten as up to ``n_segments`` contiguous
        bands of that column cut at sampled in-partition quantiles — the
        'partition by day, cluster by key' layout that keeps targeted DML
        O(affected files) inside big partitions too."""
        with open(self._manifest_path(v0)) as f:
            m = json.load(f)
        parts, dv = m.get("partitions", {}), m.get("dv", {})
        masked = {s for ap in dv.values() for s in ap}
        groups: dict[str, tuple[dict, list[str]]] = {}
        loose: list[str] = []  # segments without recorded values
        for s in m["segments"]:
            p = parts.get(s)
            if p is None:
                loose.append(s)
                continue
            k = json.dumps(p, sort_keys=True, default=str)
            groups.setdefault(k, (p, []))[1].append(s)

        def _band_edges(df: DataFrame) -> list:
            """In-partition quantile cut points (generic orderable type,
            bounded sample — the compact(range_by=) approach)."""
            n = max(1, n_segments)
            total = df.count()
            frac = min(1.0, 100_000 / max(total, 1))
            sample = sorted(
                r[0]
                for r in df.select(range_by)
                .dropna()
                .sample(fraction=frac, seed=7)
                .collect()
            )
            qs = (
                [sample[len(sample) * i // n] for i in range(1, n)]
                if sample
                else []
            )
            return [None, *sorted(set(qs)), None]

        def _write_banded(df: DataFrame, v: int, i0: int, pvals) -> list[str]:
            df = df.persist()
            try:
                segs = []
                edges = _band_edges(df)
                for j in range(len(edges) - 1):
                    lo, hi = edges[j], edges[j + 1]
                    band = df
                    if lo is not None:
                        band = band.filter(F.col(range_by) >= lo)
                    if hi is not None:
                        cond = F.col(range_by) < hi
                        if lo is None:  # nulls ride in the first band
                            cond = cond | F.col(range_by).isNull()
                        band = band.filter(cond)
                    band = band.sortWithinPartitions(range_by)
                    seg = self._write_segment(band, v, part=i0 + j)
                    if pvals is not None:
                        self._pending_parts[seg] = pvals
                    segs.append(seg)
                return segs
            finally:
                df.unpersist()

        def _fold(v: int) -> list[str]:
            segs: list[str] = []
            i = 0
            for k in sorted(groups):
                pvals, group = groups[k]
                if range_by is None and len(group) == 1 and group[0] not in masked:
                    # Already optimal: carry the segment (and its stats /
                    # partition values, via the _transact carry-forward).
                    segs.append(group[0])
                    continue
                df_g = self._to_logical(self._read_segments(group, dv))
                if range_by is None:
                    seg = self._write_segment(df_g, v, part=i)
                    self._pending_parts[seg] = pvals
                    segs.append(seg)
                    i += 1
                else:
                    new = _write_banded(df_g, v, i, pvals)
                    segs += new
                    i += len(new)
            if loose:
                df_l = self._to_logical(self._read_segments(loose, dv))
                if range_by is None:
                    segs.append(self._write_segment(df_l, v, part=i))
                else:
                    segs += _write_banded(df_l, v, i, None)
            return segs

        meta = {"compacted_partitions": len(groups)}
        if range_by is not None:
            meta["range_by"] = range_by
        return self._transact(_fold, meta=meta, base_version=v0)

    def maybe_compact(
        self,
        max_segments: int = 16,
        zorder_by: tuple[str, str] | None = None,
        range_by: str | None = None,
        n_segments: int = 8,
    ) -> bool:
        """Small-file policy: compact only when the live version holds more
        than ``max_segments`` segments. Call it after appends (streaming
        sinks, ingest loops) — amortized cost stays O(table/max_segments)
        per rewrite while reads never degrade past ``max_segments`` file
        groups. ``zorder_by`` / ``range_by`` forward to :meth:`compact`, so
        an ingest loop can keep the table key-clustered (and targeted DML
        cheap) with the same call. Returns True when a compaction ran. A
        concurrent writer winning the race simply surfaces
        ConcurrentWriteError like any other commit — the caller's next
        maybe_compact retries."""
        if self.n_segments() <= max_segments:
            return False
        self.compact(
            zorder_by=zorder_by, range_by=range_by, n_segments=n_segments
        )
        return True

    def n_segments(self) -> int:
        v = self.current_version()
        return 0 if v is None else len(self._segments(v))

    def diff(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Change-data-feed between two versions: every row added or removed
        going from ``v_from`` to ``v_to`` (default: current), tagged with a
        ``_change`` column ('insert' / 'delete'). Multiset semantics
        (exceptAll both ways), so duplicate-row count changes surface too.

        Fast path for the append-only history: when ``v_to`` reuses every
        ``v_from`` segment (the append case), the diff reads ONLY the new
        segments — O(new rows), no exceptAll over the base. Rewrite commits
        (upsert/delete/compact) fall back to the two-sided exceptAll, which
        is what a Delta CDF reader must do without a change log either."""
        v_to = self.current_version() if v_to is None else v_to
        with open(self._manifest_path(v_from)) as f:
            m_from = json.load(f)
        with open(self._manifest_path(v_to)) as f:
            m_to = json.load(f)
        old_segs, new_segs = m_from["segments"], m_to["segments"]
        # The append fast path also requires UNCHANGED deletion vectors: a
        # dv commit reuses every segment but removes rows, which the
        # added-segments read would miss entirely.
        if (
            set(old_segs) <= set(new_segs)
            and m_from.get("dv", {}) == m_to.get("dv", {})
        ):
            added = [s for s in new_segs if s not in set(old_segs)]
            if not added:
                return self.read(v_from).limit(0).withColumn(
                    "_change", F.lit("insert")
                )
            # mergeSchema matches read(): appended segments may have
            # introduced new columns, and a single-footer view would
            # silently drop them from the CDF.
            rows = self._to_logical(
                self.spark.read.option("mergeSchema", "true").parquet(
                    *[os.path.join(self.root, s) for s in added]
                )
            )
            return rows.withColumn("_change", F.lit("insert"))
        # Both sides in v_to's LOGICAL names (physical names are immutable,
        # so mapping the old snapshot with the new map is exact) — a diff
        # across a rename compares data, not column labels.
        ren, drp = m_to.get("renames", {}), m_to.get("dropped", [])
        old = self._to_logical_static(
            self._read_segments(old_segs, m_from.get("dv", {})), ren, drp
        )
        new = self._to_logical_static(
            self._read_segments(new_segs, m_to.get("dv", {})), ren, drp
        )
        return (
            new.exceptAll(old).withColumn("_change", F.lit("insert"))
            .unionByName(
                old.exceptAll(new).withColumn("_change", F.lit("delete"))
            )
        )
