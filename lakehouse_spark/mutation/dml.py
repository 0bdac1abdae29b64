"""DML plane of :class:`~lakehouse_spark.mutation.store.TableStore`:
append/init, overwrite/overwrite_where/restore, upsert/update/merge,
delete_keys and friends, plus the targeted-DML machinery that bounds every
rewrite to the files the affected keys can live in. Split out of store.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_spark.mutation.manifest import (
    SchemaMismatchError,
    _predicate_expr,
    _segment_may_match,
)


def _align_to_fields(df: DataFrame, fields) -> DataFrame:
    """Conform ``df`` to exactly ``fields`` (a StructType's fields, full
    logical schema): missing columns appear as typed nulls — the union-read
    semantics of schema evolution — and the output carries the schema's
    column order. The single alignment choke point for targeted DML
    (aligned base reads and UPDATE's pruned matched set)."""
    missing = [f for f in fields if f.name not in df.columns]
    if missing:
        df = df.select(
            "*",
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in missing],
        )
    return df.select(*[f.name for f in fields])


class DmlMixin:
    """All mutating row operations and their file-skipping helpers."""

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

    def _logical_schema(self, version: int, manifest: dict):
        """Full LOGICAL table schema at ``version``, cached per instance.
        Targeted DML needs it to align touched-segment reads to the full
        table even when schema-evolved columns live only in untouched
        segments — and re-unioning EVERY segment's footer per statement
        for that alignment is an O(table) Spark-planning cost a 1-row
        targeted DELETE must not pay. DML itself never changes the schema
        (sources are projected to the target's columns; merge
        ``extra_cols='evolve'`` widens explicitly and invalidates), so
        :meth:`_carry_schema` rolls the cache forward across this
        instance's own DML commits; any other writer's commit changes the
        version and forces one rebuild."""
        cached = getattr(self, "_schema_cache", None)
        if cached is not None and cached[0] == version:
            return cached[1]
        sj = None if manifest is None else manifest.get("schema")
        if manifest is None and sj is None:
            manifest = self._snapshot(version)
            sj = manifest.get("schema")
        if sj is not None:
            # Recorded-schema fast path (tables written since round 11):
            # the manifest's schema scalar IS the footer union — present
            # it logically (renames applied, dropped filtered, nullable:
            # evolved columns read null in older segments). Valid for
            # PRUNED manifests too: scalars ride the list doc complete.
            from pyspark.sql.types import StructType

            renames = manifest.get("renames", {})
            dropped = manifest.get("dropped", [])
            fields = [
                {
                    **f,
                    "name": renames.get(f["name"], f["name"]),
                    "nullable": True,
                }
                for f in sj["fields"]
                if f["name"] not in dropped
            ]
            schema = StructType.fromJson(
                {"type": "struct", "fields": fields}
            )
            self._schema_cache = (version, schema)
            return schema
        if manifest.get("pruned"):
            # A predicate-scoped partial snapshot lists only matching
            # segments — the footer-union fallback must run over all.
            manifest = self._snapshot(version)
        full = self._to_logical_static(
            self._read_segments(manifest["segments"], {}),
            manifest.get("renames", {}),
            manifest.get("dropped", []),
        )
        self._schema_cache = (version, full.schema)
        return full.schema

    def _carry_schema(self, version: int | None) -> None:
        """Roll the schema cache forward to ``version`` after a DML commit
        that provably did not change the table schema."""
        cached = getattr(self, "_schema_cache", None)
        if cached is not None and version is not None:
            self._schema_cache = (version, cached[1])

    def _carry_schema_union(self, version: int | None, written) -> None:
        """Roll the schema cache forward across an APPEND: the new version's
        schema is the old one plus any columns the appended frame
        introduced (additive evolution — old segments read them as null,
        hence nullable). Type conflicts were already rejected, so the
        union is exact. A fresh StructType is built (StructType.add
        mutates the receiver)."""
        cached = getattr(self, "_schema_cache", None)
        if cached is None or version is None:
            return
        from pyspark.sql.types import StructField, StructType

        have = {f.name for f in cached[1].fields}
        extra = [f for f in written.fields if f.name not in have]
        if extra:
            self._schema_cache = (
                version,
                StructType(
                    list(cached[1].fields)
                    + [StructField(f.name, f.dataType, True) for f in extra]
                ),
            )
        else:
            self._schema_cache = (version, cached[1])

    def _dml_manifest(self, v: int, predicate: dict | None) -> dict:
        """Snapshot for DML file selection. With a selective predicate,
        prefer the two-level checkpoint's shard bounds (O(matched shards)
        — even on a WARM instance, where the full snapshot itself is a
        cache hit but the per-segment selection loop over it is O(table)
        Python per statement). The partial snapshot is a provable SUPERSET
        of the matching segments, carries their stats/partition values,
        and its dv/scalar planes are complete — exactly what the
        per-segment selection and :meth:`_aligned_base` consume. Tables
        without a sharded checkpoint (or pre-checkpoint versions) fall
        back to the full snapshot, the previous behavior."""
        if predicate:
            # Same gate as read() (shared helpers — see reads.py): a warm
            # SMALL snapshot's selection loop is cheaper than any
            # checkpoint IO; cold or large goes through shard bounds, with
            # the negative-result memo so tables without a sharded
            # checkpoint don't re-walk the chain per statement.
            from lakehouse_spark.mutation.reads import _WARM_PRUNE_MIN_SEGS

            warm_n = self._warm_seg_count(v)
            if warm_n is None or warm_n > _WARM_PRUNE_MIN_SEGS:
                m = self._try_pruned(v, predicate)
                if m is not None:
                    return m
        return self._snapshot(v)

    def _aligned_base(
        self, manifest: dict, touched: list[str], version: int | None = None
    ) -> DataFrame:
        """Read the touched segments (deletion vectors applied) aligned to
        the FULL table schema, so targeted DML behaves byte-identically to
        the full-table form even when schema-evolved columns live only in
        untouched segments. Returned in LOGICAL column names (renames
        applied, dropped columns gone): every DML path computes in logical
        space and _write_segment translates back to physical on write —
        which is also what physically purges dropped columns from any
        segment a rewrite touches. With ``version`` the alignment schema
        comes from the per-version cache (O(affected) planning: only the
        touched segments are opened); without it, the legacy full-union
        read."""
        renames = manifest.get("renames", {})
        drop_cols = manifest.get("dropped", [])

        def _logical(df: DataFrame) -> DataFrame:
            return self._to_logical_static(df, renames, drop_cols)

        dv = manifest.get("dv", {})
        if version is not None:
            schema = self._logical_schema(version, manifest)
            if not touched:
                return self.spark.createDataFrame([], schema)
            return _align_to_fields(
                _logical(self._read_segments(touched, dv)), schema.fields
            )
        full = _logical(self._read_segments(manifest["segments"], dv))
        if set(touched) == set(manifest["segments"]):
            return full
        if not touched:
            return full.limit(0)
        return _align_to_fields(
            _logical(self._read_segments(touched, dv)), full.schema.fields
        )


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
        # Append LANE: prior segments ride by reference inside the claimed
        # transaction (once v is claimed, v-1 is immutable) and the commit
        # touches O(new segments) manifest state — the head mirror evolves
        # in place, so ingest commit latency is flat in table size.
        nv = self._transact(
            None,
            meta,
            txn,
            append_make=lambda v: self._write_partitioned(rows, v),
        )
        self._carry_schema_union(nv, rows.schema)

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
        # poison the merge. The target schema comes from the per-version
        # cache: re-unioning every segment's footer per WRITE is an
        # O(table) planning cost the hot append path must not pay.
        target = {
            f.name: f.dataType.simpleString()
            for f in self._logical_schema(self.current_version(), None).fields
        }
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
        m = self._snapshot(version)  # raises FileNotFoundError if vacuumed
        v = self._transact(
            lambda _v: m["segments"],
            meta={"restored_from": version},
            schema_override=m.get("schema"),
            # Pin the restored version's FULL state, not just its data:
            # deletion vectors (carrying the head's would keep masking
            # rows the restored state had), per-segment stats/partition
            # values (the head's carry-forward doesn't know segments it no
            # longer references), and the logical-schema plane —
            # constraints, generated columns, column mapping, partition
            # layout. Restoring across a RENAME/DROP COLUMN or a
            # repartition_table must bring the old schema and layout back,
            # exactly Delta's RESTORE contract (data AND metadata roll
            # back; the bad commits stay inspectable in history).
            dv_override=m.get("dv", {}),
            stats_override=m.get("stats", {}),
            partitions_override=m.get("partitions", {}),
            constraints_override=m.get("constraints", {}),
            generated_override=m.get("generated", {}),
            columns_override=(m.get("renames", {}), m.get("dropped", [])),
            partition_by_override=m.get("partition_by", []),
        )
        # Future writes from THIS instance follow the restored layout (the
        # same instance-state roll that repartition_table performs).
        self.partition_by = tuple(m.get("partition_by", []))
        return v

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
        manifest = self._dml_manifest(v0, predicate)
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
        base = self._aligned_base(manifest, touched, version=v0)
        # Survivors = rows NOT matching (a null-valued predicate column
        # means "doesn't match" and therefore survives).
        survivors = base.filter(~F.coalesce(cond, F.lit(False)))
        out = survivors.unionByName(df.select(*base.columns))
        # Interleaved appends provably OUTSIDE the replaced region commute
        # (serial order: replace, then append) — rebase instead of raising.
        # Mutate lane: the commit records (touched-removed, added) — the
        # untouched segments ride by reference with O(affected) metadata.
        nv = self._transact(
            None,
            meta,
            txn,
            base_version=v0,
            rebase_predicate=phys_pred,
            mutate_make=(
                touched,
                lambda v: self._write_partitioned(out, v),
            ),
        )
        self._carry_schema(nv)
        return nv

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
        keys = self._source_key_list(rows)
        # Key-range shard pruning: selection scans only the checkpoint
        # shards whose key bounds overlap the source keys, not every
        # segment record (falls back to the full snapshot when there is
        # no sharded checkpoint).
        manifest = self._dml_manifest(
            v0, {self.key: (keys[0], keys[-1])} if keys else None
        )
        if keys is None:
            touched = manifest["segments"]
        else:
            touched, _ = self._split_by_key_overlap(manifest, keys)
        # Conflict-rebase proof: an interleaved blind append commutes with
        # this upsert iff its segments provably hold NONE of the source
        # keys (else carried-through appended rows would duplicate keys
        # the new segment also carries). Key column is rename-guarded, so
        # the logical name IS the physical name.
        rebase_pred = {self.key: keys} if keys is not None else None
        base = self._aligned_base(manifest, touched, version=v0)
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
                return new_segs

            # Append lane (prior segments by reference): the commit writes
            # O(changed rows) data AND touches O(changed) manifest state.
            nv = self._transact(
                None,
                txn=txn,
                base_version=v0,
                rebase_predicate=rebase_pred,
                append_make=_mor,
            )
            self._carry_schema(nv)
            return
        survivors = base.join(rows.select(self.key), self.key, "left_anti")
        out = survivors.unionByName(rows.select(*base.columns))
        nv = self._transact(
            None,
            txn=txn,
            base_version=v0,
            rebase_predicate=rebase_pred,
            mutate_make=(
                touched,
                lambda v: self._write_partitioned(out, v),
            ),
        )
        self._carry_schema(nv)

    def update(
        self,
        set: dict[str, str],
        where: str | None = None,
        predicate: dict | None = None,
        mode: str = "rewrite",
        txn: tuple[str, int] | None = None,
        keys: DataFrame | None = None,
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

        ``keys`` is the DISTRIBUTED key-set form (``UPDATE ... WHERE key
        IN (SELECT ...)`` beyond any inline-literal cap): a one-column
        frame of key values; matched rows are found with a semi-join that
        never materializes the set on the driver, composing with ``where``
        /``predicate`` as an extra conjunct. The targeted rewrite
        underneath still applies key-stats file skipping (the POST-image
        keys drive it); arbitrarily large key sets degrade gracefully to
        the full rewrite exactly like upsert. This is Delta's
        UPDATE-with-subquery cost shape.

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
        full_schema = self._logical_schema(v0, None)
        cols = [f.name for f in full_schema.fields]
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
        # Align to the FULL logical schema: a selective predicate can prune
        # the read to segments that predate an evolved column, and the
        # post-image rows must still carry it (as null — exactly what an
        # unpruned read presents). Without this the rewrite failed to
        # resolve the column (and a conform-by-subset would have silently
        # dropped it from the rewritten segments).
        matched = _align_to_fields(matched, full_schema.fields)
        if keys is not None:
            kf = keys
            if len(kf.columns) != 1:
                raise ValueError(
                    f"keys frame must have exactly one column, got {kf.columns}"
                )
            kf = kf.toDF(key).filter(F.col(key).isNotNull()).distinct()
            matched = matched.join(kf, key, "left_semi")
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
        tkeys = self._source_key_list(source)
        manifest = self._dml_manifest(
            v0, {self.key: (tkeys[0], tkeys[-1])} if tkeys else None
        )
        if tkeys is None:
            touched = manifest["segments"]
        else:
            touched, _ = self._split_by_key_overlap(manifest, tkeys)
        # Same commute proof as upsert: interleaved appends must provably
        # hold none of the source keys.
        rebase_pred = {self.key: tkeys} if tkeys is not None else None
        base = self._aligned_base(manifest, touched, version=v0)
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
                new_segs = self._write_partitioned(new_seg_rows, v)
                if has_masks:
                    name = f"_dv{v:06d}"
                    pre.write.mode("overwrite").parquet(self._dv_path(name))
                    self._pending_dv[name] = list(touched)
                return new_segs

            nv = self._transact(
                None,
                txn=txn,
                base_version=v0,
                rebase_predicate=rebase_pred,
                append_make=_mor,
            )
            if unknown and extra_cols == "evolve":
                self._schema_cache = None  # schema widened: rebuild
            else:
                self._carry_schema(nv)
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
        nv = self._transact(
            None,
            txn=txn,
            base_version=v0,
            rebase_predicate=rebase_pred,
            mutate_make=(
                touched,
                lambda v: self._write_partitioned(out, v),
            ),
        )
        if unknown and extra_cols == "evolve":
            self._schema_cache = None  # schema widened: rebuild
        else:
            self._carry_schema(nv)

    def delete_where(
        self,
        where: str | None = None,
        predicate: dict | None = None,
        mode: str = "rewrite",
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Delta's ``DELETE FROM t WHERE ...``. ``where`` is a SQL boolean
        over the row; ``predicate`` is the :meth:`read` dict form of (part
        of) the same condition and is what buys file skipping — segments
        whose stats/partition values can't match are reused by reference,
        so a partition-scoped delete is O(affected segments). At least one
        of the two is required (deleting every row should be the explicit
        ``overwrite`` of an empty frame, not a DELETE with no WHERE).

        ``mode="rewrite"`` (default) deletes EXACT rows: the touched
        segments' survivors are rewritten. ``mode="dv"`` is merge-on-read:
        O(deleted rows) written, no segment rewritten — but this store's
        deletion vectors mask by KEY, so dv mode requires every matched
        key's rows to ALL match the condition (true on unique-key tables,
        always true for delete_keys); a partial-key match raises with
        instructions to use rewrite mode rather than silently deleting
        sibling rows the WHERE spared. Returns the number of deleted
        rows."""
        if where is None and predicate is None:
            raise ValueError(
                "DELETE with no condition would drop every row; call "
                "overwrite() with an empty frame if that is really meant"
            )
        if mode not in ("rewrite", "dv"):
            raise ValueError(f"mode must be 'rewrite' or 'dv', got {mode!r}")
        v0 = self.current_version()
        if v0 is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        manifest = self._dml_manifest(v0, predicate)
        touched = manifest["segments"]
        rebase_pred = None
        if predicate:
            stats = manifest.get("stats", {})
            parts = manifest.get("partitions", {})
            phys_pred = self._pred_to_physical(predicate)
            # Interleaved appends provably disjoint from the delete's
            # predicate commute (they land "after" the delete in the
            # serial order, so their rows correctly survive).
            rebase_pred = phys_pred
            touched = [
                s
                for s in manifest["segments"]
                if _segment_may_match(stats.get(s), phys_pred)
                and self._partition_may_match(parts.get(s), phys_pred)
            ]
        if not touched:
            return 0  # provably nothing matches; no commit needed
        base = self._aligned_base(manifest, touched, version=v0)
        cond = _predicate_expr(predicate) if predicate else None
        if where is not None:
            w = F.expr(where)
            cond = w if cond is None else (cond & w)
        matched_cond = F.coalesce(cond, F.lit(False))  # NULL = not matched
        if mode == "rewrite":
            base = base.persist()
            try:
                survivors = base.filter(~matched_cond)
                removed = base.count() - survivors.count()
                if removed == 0:
                    return 0
                nv = self._transact(
                    None,
                    txn=txn,
                    base_version=v0,
                    rebase_predicate=rebase_pred,
                    mutate_make=(
                        touched,
                        lambda v: self._write_partitioned(survivors, v),
                    ),
                )
                self._carry_schema(nv)
                return removed
            finally:
                base.unpersist()
        pre = base.filter(matched_cond).persist()
        try:
            removed = pre.count()
            if removed == 0:
                return 0
            key_rows = base.join(
                pre.select(self.key).distinct(), self.key, "left_semi"
            ).count()
            if key_rows != removed:
                raise ValueError(
                    "mode='dv' masks by key, but the condition matches only "
                    "SOME rows of at least one key — a dv would also delete "
                    "the rows the WHERE spared; use mode='rewrite' for "
                    "row-exact deletes on duplicate-key tables"
                )

            def _keep(v: int) -> list[str]:
                name = f"_dv{v:06d}"
                pre.write.mode("overwrite").parquet(self._dv_path(name))
                # Scope the dv to the predicate-touched segments only
                # (matching the upsert/merge dv paths at :424/:690). The
                # key-granularity guard above only inspects rows in the
                # touched segments, so registering against ALL segments
                # would silently mask a matched key's sibling rows living
                # in predicate-pruned segments.
                self._pending_dv[name] = list(touched)
                return []

            nv = self._transact(
                None,
                txn=txn,
                base_version=v0,
                rebase_predicate=rebase_pred,
                append_make=_keep,
            )
            self._carry_schema(nv)
            return removed
        finally:
            pre.unpersist()

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
        keyset = keys.select(self.key).distinct()
        # Deleted rows can only live in segments whose key stats overlap the
        # key set — read (and in rewrite mode, rewrite) just those. Shard
        # pruning narrows the selection scan itself to the checkpoint
        # shards whose key bounds overlap.
        klist = self._source_key_list(keyset)
        manifest = self._dml_manifest(
            v0, {self.key: (klist[0], klist[-1])} if klist else None
        )
        if klist is None:
            touched = manifest["segments"]
        else:
            touched, _ = self._split_by_key_overlap(manifest, klist)
        # Appends provably free of the deleted keys commute with this
        # delete (their rows survive either serial order).
        rebase_pred = {self.key: klist} if klist is not None else None
        if not touched:
            return 0  # provably nothing to delete; no commit needed
        base = self._aligned_base(manifest, touched, version=v0)
        if mode == "rewrite":
            out = base.join(keyset, self.key, "left_anti")
            removed = base.count() - out.count()
            nv = self._transact(
                None,
                base_version=v0,
                rebase_predicate=rebase_pred,
                mutate_make=(
                    touched,
                    lambda v: self._write_partitioned(out, v),
                ),
            )
            self._carry_schema(nv)
            return removed
        deleted = base.join(F.broadcast(keyset), self.key, "left_semi")
        removed = deleted.count()
        if removed == 0:
            return 0
        def _keep(v: int) -> list[str]:
            name = f"_dv{v:06d}"
            deleted.write.mode("overwrite").parquet(self._dv_path(name))
            # Scope applies_to to the key-touched segments (stats overlap,
            # computed above): segments provably free of the deleted keys
            # never need the read-time anti-join mask, and the commit
            # record stays O(touched) instead of listing every live
            # segment. Unclustered keys (klist None) degrade to all
            # segments, as before.
            self._pending_dv[name] = list(touched)
            return []

        # base_version pins the dv's pre-images to the segment list they
        # were computed from — a commit landing between the read above and
        # the claim would make applies_to describe the wrong snapshot
        # (unless provably-disjoint appends, which the rebase carries
        # through unmasked — the head at v-1 already holds them, and the
        # dv never applies to them by construction).
        nv = self._transact(
            None,
            base_version=v0,
            rebase_predicate=rebase_pred,
            append_make=_keep,
        )
        self._carry_schema(nv)
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

