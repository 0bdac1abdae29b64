"""Incremental materialized-view maintenance over a versioned TableStore.

The classic warehouse feature the reference lacks (its analytics recompute
from the JSONL log every call — e.g. the metrics loop in
``amplifierd/routers/sessions.py:756-789`` re-walks every session): keep a
groupBy aggregate as its own versioned table and advance it from the base
table's change-data-feed instead of rescanning the base.

Why it matters at 100 TB: a full refresh of ``SELECT k, count(*), sum(x)``
rescans the fact table; the incremental path reads ONLY the CDF rows since
the last refresh (for append-only commits, TableStore.diff is O(new rows) —
it opens just the new segments) and merges them into the view with one
shuffle over the DELTA, whose size is bounded by the change volume, not the
table. This is self-maintenance of distributive aggregates (count/sum)
under inserts AND deletes: each change applies with sign +1/-1, groups
whose count reaches zero drop out. Non-self-maintainable aggregates
(min/max under deletes) are out of scope by design — use
``refresh(full=True)``.

Sums are maintained in DECIMAL so merge order can't perturb the result:
the incremental total is bit-identical to a from-scratch recompute, which
the tests assert with equality, not tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_spark.mutation.store import TableStore

_DEC = "decimal(28,6)"


class MaterializedAgg:
    """A count+sums groupBy view over ``base``, stored as its own
    TableStore with the reflected base version in the manifest meta.

    Columns of the view: ``group_cols`` + ``n`` (count) + one ``sum_<c>``
    per entry of ``sum_cols`` + the internal join key ``_group_key``.
    """

    META_KEY = "mview_base_version"
    # Stamped into every view commit; a persisted view WITHOUT the current
    # marker was keyed by an older scheme (the pre-round-5 concat_ws form)
    # and must be fully rebuilt — merging new-format deltas into old-format
    # rows would double-count every group.
    FORMAT_KEY = "mview_key_format"
    FORMAT = "json1"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        base: TableStore,
        group_cols: list[str],
        sum_cols: tuple[str, ...] = (),
    ):
        self.spark = spark
        self.base = base
        self.group_cols = list(group_cols)
        self.sum_cols = tuple(sum_cols)
        self.view = TableStore(spark, root, key="_group_key")

    # -- aggregate shapes ------------------------------------------------------

    def _aggs(self, sign=None):
        one = F.lit(1) if sign is None else sign
        out = [F.sum(one).alias("n")]
        for c in self.sum_cols:
            term = F.col(c).cast(_DEC)
            if sign is not None:
                term = term * sign
            out.append(F.sum(term).alias(f"sum_{c}"))
        return out

    def _with_key(self, df: DataFrame) -> DataFrame:
        # Null-unambiguous key: to_json keeps field names and explicit
        # nulls, so (NULL,'x') vs ('x',NULL) vs ('',…) all key differently —
        # concat_ws would silently skip NULLs and collide distinct groups.
        key = F.to_json(
            F.struct(*[F.col(c) for c in self.group_cols]),
            {"ignoreNullFields": "false"},
        )
        return df.withColumn("_group_key", key)

    def base_version_reflected(self) -> int | None:
        meta = self.view.version_meta() if self.view.exists() else {}
        v = meta.get(self.META_KEY)
        return None if v is None else int(v)

    def read(self) -> DataFrame:
        return self.view.read().drop("_group_key")

    # -- refresh ---------------------------------------------------------------

    def refresh(self, full: bool = False) -> int:
        """Advance the view to the base's current version; returns that
        version. First call (or ``full=True``) computes from scratch; later
        calls merge only the CDF delta."""
        v_base = self.base.current_version()
        if v_base is None:
            raise FileNotFoundError("base table has no committed version")
        v_have = self.base_version_reflected()
        stale_format = (
            self.view.exists()
            and self.view.version_meta().get(self.FORMAT_KEY) != self.FORMAT
        )
        if v_have == v_base and not stale_format:
            return v_base
        if full or v_have is None or stale_format:
            snap = self.base.read(v_base).groupBy(*self.group_cols).agg(
                *self._aggs()
            )
            self.view.overwrite(
                self._with_key(snap),
                meta={self.META_KEY: v_base, self.FORMAT_KEY: self.FORMAT},
            )
            return v_base

        # Delta source preference: the change feed (stored _cdc files +
        # append segments) is O(changes-read) for EVERY commit kind; diff's
        # rewrite path is two exceptAll passes over the full snapshots —
        # O(table), the thing incremental maintenance exists to avoid. Use
        # changes() whenever every commit in the range can serve it
        # (append commits always can; rewrites once materialized — base
        # tables feeding views should run with write_cdf=True).
        try:
            use_cdf = all(
                self.base.has_cdf(v) for v in range(v_have + 1, v_base + 1)
            )
        except FileNotFoundError:  # a classifying manifest was vacuumed
            use_cdf = False
        if use_cdf:
            sign = F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            ).otherwise(F.lit(-1))
            feed = self.base.changes(v_have + 1, v_base).drop(
                "_commit_version"
            )
            delta = feed.groupBy(*self.group_cols).agg(*self._aggs(sign))
        else:
            sign = F.when(F.col("_change") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            )
            delta = (
                self.base.diff(v_have, v_base)
                .groupBy(*self.group_cols)
                .agg(*self._aggs(sign))
            )
        d = self._with_key(delta).select(
            "_group_key",
            *[F.col(c).alias(f"__d_{c}") for c in self.group_cols],
            F.col("n").alias("__dn"),
            *[F.col(f"sum_{c}").alias(f"__dsum_{c}") for c in self.sum_cols],
        )
        cur = self.view.read()
        merged = cur.join(d, "_group_key", "full_outer").select(
            "_group_key",
            *[
                F.coalesce(F.col(c), F.col(f"__d_{c}")).alias(c)
                for c in self.group_cols
            ],
            (
                F.coalesce(F.col("n"), F.lit(0))
                + F.coalesce(F.col("__dn"), F.lit(0))
            ).alias("n"),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0).cast(_DEC))
                    + F.coalesce(F.col(f"__dsum_{c}"), F.lit(0).cast(_DEC))
                ).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
        )
        self.view.overwrite(
            merged.filter(F.col("n") > 0),
            meta={self.META_KEY: v_base, self.FORMAT_KEY: self.FORMAT},
        )
        return v_base
