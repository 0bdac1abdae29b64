"""Keyed table store: append / upsert / delete-last / retention sweep
(SURVEY.md §1.3 and §2 SC4, SC5, O9, J4, F2-cleanup).

The reference mutates state with append-only JSONL logs plus atomic
tmp+rename document rewrites (sessions/manager.py:282-283,519-525 — read,
not copied). The lakehouse-native equivalents are Delta `APPEND` and
`MERGE`; this container has no Delta package, so the same semantics are
implemented over partition-directory Parquet with an atomic-pointer commit:

- every write produces a new immutable version directory
  ``<root>/_v<nnn>/part-*.parquet``
- ``_CURRENT`` is a one-line pointer file atomically renamed into place —
  readers always see a complete version (the tmp+rename idea, applied to a
  whole table version instead of one JSON document)

On a cluster with Delta/Iceberg available, `TableStore` maps 1:1 onto
`MERGE INTO`/`DELETE`/`OPTIMIZE` — the call sites don't change. Version
directories double as time travel and make the store safe for concurrent
readers during a writer's commit.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

try:  # Delta is the production path; gate so local runs work without it
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except ImportError:
    HAS_DELTA = False

_POINTER = "_CURRENT"


class TableStore:
    """Versioned keyed Parquet table with atomic pointer commits."""

    def __init__(self, spark: SparkSession, root: str, key: str):
        self.spark = spark
        self.root = root
        self.key = key
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

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.root, f"_v{v:06d}")

    def _commit(self, df: DataFrame) -> int:
        cur = self.current_version()
        nxt = 0 if cur is None else cur + 1
        df.write.mode("overwrite").parquet(self._version_dir(nxt))
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self._pointer_path())  # atomic pointer swap
        return nxt

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop version directories older than the newest ``keep_last``."""
        cur = self.current_version()
        if cur is None:
            return
        for name in os.listdir(self.root):
            if name.startswith("_v") and int(name[2:]) <= cur - keep_last:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    # -- reads ----------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        return self.spark.read.parquet(self._version_dir(v))

    def exists(self) -> bool:
        return self.current_version() is not None

    # -- writes ----------------------------------------------------------------

    def init(self, df: DataFrame) -> None:
        self._commit(df)

    def append(self, rows: DataFrame) -> None:
        """SC4: append-only log write (the reference's open(...,'a'))."""
        base = self.read() if self.exists() else None
        out = rows if base is None else base.unionByName(rows)
        self._commit(out)

    def upsert(self, rows: DataFrame) -> None:
        """SC5: whole-row upsert keyed by ``self.key`` — the atomic
        tmp+rename document replace. Delta form: MERGE WHEN MATCHED UPDATE
        WHEN NOT MATCHED INSERT."""
        if not self.exists():
            self._commit(rows)
            return
        base = self.read()
        survivors = base.join(rows.select(self.key), self.key, "left_anti")
        self._commit(survivors.unionByName(rows.select(*base.columns)))

    def delete_keys(self, keys: DataFrame) -> int:
        """J4 target: delete all rows whose key appears in ``keys`` (feed
        with plans.closure.cascade_delete_targets for recursive deletes)."""
        base = self.read()
        out = base.join(keys.select(self.key).distinct(), self.key, "left_anti")
        removed = base.count() - out.count()
        self._commit(out)
        return removed

    def delete_last_per_group(self, group: str, order_col: str) -> None:
        """O9 ← manager.py:293-325: drop the newest row per group (the
        reference's delete-last-transcript-line, as a versioned rewrite)."""
        base = self.read()
        w = Window.partitionBy(group).orderBy(F.desc(order_col))
        out = (
            base.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .drop("__rn")
        )
        self._commit(out)

    def retention_sweep(
        self, ended_col: str, created_col: str, cutoff
    ) -> int:
        """F2 cleanup ← manager.py:472-498: delete rows with
        coalesce(ended, created) < cutoff; returns removed count (A7)."""
        base = self.read()
        keep = base.filter(
            ~(F.coalesce(F.col(ended_col), F.col(created_col)) < F.lit(cutoff))
        )
        removed = base.count() - keep.count()
        self._commit(keep)
        return removed
