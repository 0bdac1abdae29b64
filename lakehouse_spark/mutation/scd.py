"""Slowly-changing-dimension (type 2) history from a TableStore's version
log — every row's validity interval reconstructed from change-data-feed
diffs, without the writer ever maintaining SCD columns.

Delta calls this reading the table's CDF into a dimension history; the
reference has no analog (its JSONL store keeps only current state). At
scale the cost is O(total changes): each version pair contributes only its
diff (append-only commits read just the new segments — see
TableStore.diff), and the open/close pairing is one shuffle on the row
identity hash. The driver-side loop runs over VERSIONS (metadata scale,
bounded by retention), never over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_spark.mutation.store import TableStore


def scd2_history(store: TableStore) -> DataFrame:
    """Rows of every retained version with ``valid_from`` / ``valid_to``
    version stamps and ``is_current``.

    Row identity is the FULL row (a re-inserted identical row reopens an
    interval): the i-th insertion of a given row value pairs with the i-th
    deletion — the same ordered-pairing shape as tool pre/post matching
    (row_number per identity on each side, join on (identity, i)).
    ``valid_to`` is null while the row is live in the head version.
    """
    versions = [h["version"] for h in store.history()][::-1]  # oldest first
    if not versions:
        raise FileNotFoundError(f"table {store.root} has no committed version")

    cols = store.read(versions[0]).columns
    opens: DataFrame | None = None
    closes: DataFrame | None = None

    def _acc(acc, df):
        return df if acc is None else acc.unionByName(df)

    first = store.read(versions[0]).withColumn(
        "__v", F.lit(versions[0]).cast("long")
    )
    opens = _acc(opens, first)
    for prev, cur in zip(versions, versions[1:]):
        d = store.diff(prev, cur)
        ins = d.filter(F.col("_change") == "insert").drop("_change")
        dels = d.filter(F.col("_change") == "delete").drop("_change")
        opens = _acc(opens, ins.withColumn("__v", F.lit(cur).cast("long")))
        closes = _acc(closes, dels.withColumn("__v", F.lit(cur).cast("long")))

    # Null-unambiguous identity: to_json keeps field names and explicit
    # nulls, so rows differing only in which column is NULL (or NULL vs '')
    # get distinct identities — concat_ws would skip NULLs and mis-pair
    # open/close intervals.
    ident = F.sha2(
        F.to_json(
            F.struct(*[F.col(c) for c in cols]),
            {"ignoreNullFields": "false"},
        ),
        256,
    )
    o = opens.withColumn("__id", ident)
    w_o = Window.partitionBy("__id").orderBy("__v")
    o = o.withColumn("__i", F.row_number().over(w_o))
    if closes is None:
        return o.select(
            *cols,
            F.col("__v").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    c = closes.withColumn("__id", ident).select(
        "__id", F.col("__v").alias("__close_v")
    )
    w_c = Window.partitionBy("__id").orderBy("__close_v")
    c = c.withColumn("__i", F.row_number().over(w_c))
    paired = o.join(c, ["__id", "__i"], "left")
    return paired.select(
        *cols,
        F.col("__v").alias("valid_from"),
        F.col("__close_v").alias("valid_to"),
        F.col("__close_v").isNull().alias("is_current"),
    )


def as_of_version_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    version_col: str,
) -> DataFrame:
    """Point-in-time-correct enrichment (the feature-store replay join):
    each fact row joins the dimension row that was LIVE at the fact's
    observed base version — key equality plus
    ``valid_from <= version < valid_to`` (open ``valid_to`` = still live).
    Guarantees no time-travel leakage: a fact can never see attribute
    values committed after it was observed.

    The predicate is an equi join on ``key`` with the version range as the
    join filter — per-key history is short (one row per change), so the
    range filter prunes a handful of candidates after the hash join; no
    range-join blow-up."""
    h = history.alias("__h")
    f = facts.alias("__f")
    cond = (
        (F.col(f"__f.{key}") == F.col(f"__h.{key}"))
        & (F.col(f"__f.{version_col}") >= F.col("__h.valid_from"))
        & (
            F.col("__h.valid_to").isNull()
            | (F.col(f"__f.{version_col}") < F.col("__h.valid_to"))
        )
    )
    dim_cols = [
        c
        for c in history.columns
        if c not in {key, "valid_from", "valid_to", "is_current"}
    ]
    return f.join(h, cond, "left").select(
        "__f.*", *[F.col(f"__h.{c}").alias(c) for c in dim_cols]
    )
