"""Differential-testing harness: Spark result vs DuckDB oracle.

Mirrors what the driver's correctness gate does (row count + schema-name +
order-insensitive value hash) so mismatches are caught locally before a
round ends. Canonicalization: columns sorted by name, rows sorted by their
full value tuple, floats formatted through repr of round-tripped values,
timestamps rendered ISO — both engines pass through the same path.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from datetime import date, datetime

import duckdb
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0.0"  # normalize -0.0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def canonical_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "|".join(_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    schema_match: bool
    hash_match: bool
    spark_cols: tuple[str, ...] = ()
    oracle_cols: tuple[str, ...] = ()

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.schema_match
            and self.hash_match
        )


def compare(
    name: str,
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
) -> CompareResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(oracle_sql)
    o_cols = list(rel.columns)
    o_rows = [tuple(r) for r in rel.fetchall()]
    schema_match = sorted(s_cols) == sorted(o_cols)
    hash_match = canonical_hash(s_cols, s_rows) == canonical_hash(o_cols, o_rows)
    return CompareResult(
        name, len(s_rows), len(o_rows), schema_match, hash_match,
        tuple(s_cols), tuple(o_cols),
    )


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    from lakehouse_spark.queries import CATALOG

    from lakehouse_spark.operators.dedup import release_caches

    con = duckdb_connect(sf_dir)
    out: list[CompareResult] = []
    for name, spec in CATALOG.items():
        if names and name not in names:
            continue
        if spec.oracle is None:
            df = spec.build(spark, sf_dir)
            n = df.count()
            out.append(CompareResult(name, n, n, True, True))
        else:
            out.append(compare(name, spec.build(spark, sf_dir), con, spec.oracle))
        release_caches()  # dedup intermediates don't outlive their query
    return out


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m lakehouse_spark.oracle [sf_dir] [name ...]`` — run
    the differential harness and print one line per entry + a summary."""
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    from lakehouse_spark.session import get_spark

    res = run_all(get_spark(), sf_dir, args or None)
    bad = [r for r in res if not r.ok]
    for r in res:
        status = "ok" if r.ok else (
            f"FAIL rows={r.spark_rows}/{r.oracle_rows} "
            f"schema={r.schema_match} hash={r.hash_match}"
        )
        print(f"{r.name:40s} {status}")
    print(f"-- {len(res) - len(bad)}/{len(res)} green")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
