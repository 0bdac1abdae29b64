"""Physical-plan audit: the engine's scale rules as a callable lint.

The repo's test suite pins plan shapes per query; this module exposes the
same checks as a library so USERS can gate their own pipelines before a
100 TB run — ``audit(df)`` returns the findings, ``assert_scalable(df)``
raises on the ones that never belong in a production plan.

Checks (each is a plan-text pattern, same methodology as
tests/test_plan_quality.py):

- ``cartesian_product`` — CartesianProduct: O(n·m) row explosion.
- ``broadcast_nested_loop`` — BroadcastNestedLoopJoin: non-equi join
  fallback; fine for a 1-row side, fatal for anything real.
- ``python_row_udf`` — BatchEvalPython: row-at-a-time Python UDF in the
  plan (Arrow-batched pandas UDFs show as ArrowEvalPython / MapInPandas
  and are allowed — they are the sanctioned escape hatch).
- ``unpartitioned_window`` (advisory) — a window function whose partition
  spec is empty: every row it sees flows through ONE task. Advisory, not
  fatal, because the two-phase global-index pattern legitimately runs one
  partition-less window over a TINY aggregated table (per-bucket counts)
  — fatal only if it sits over the data, which plan text alone cannot
  distinguish; the finding tells the reader what to check.
- ``full_scan_no_pruning`` (advisory) — a parquet scan with neither
  PushedFilters nor a pruned ReadSchema; often intended (full-table
  aggregates), so it is reported but never fatal.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    check: str
    fatal: bool
    detail: str


def plan_text(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(df: DataFrame) -> list[Finding]:
    """Run every check against ``df``'s physical plan."""
    plan = plan_text(df)
    out: list[Finding] = []
    if "CartesianProduct" in plan:
        out.append(Finding("cartesian_product", True,
                           "CartesianProduct in plan: O(n*m) row explosion"))
    if "BroadcastNestedLoopJoin" in plan:
        out.append(Finding("broadcast_nested_loop", True,
                           "BroadcastNestedLoopJoin: non-equi join fallback"))
    if "BatchEvalPython" in plan:
        out.append(Finding("python_row_udf", True,
                           "row-at-a-time Python UDF (BatchEvalPython); use "
                           "a pandas UDF (ArrowEvalPython) instead"))
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            spec = line.split("windowspecdefinition(", 1)[1]
            first_arg = spec.split(",")[0]
            if "ASC" in first_arg or "DESC" in first_arg:
                out.append(Finding(
                    "unpartitioned_window", False,
                    "window with empty PARTITION BY: single-task bottleneck "
                    "unless its input is a tiny aggregate (two-phase index "
                    "offsets table) — verify which relation feeds it",
                ))
                break
    if "PushedFilters: []" in plan:
        # a scan with no pushed filter at all — advisory only
        out.append(Finding(
            "full_scan_no_pruning", False,
            "parquet scan without pushed filters (fine for full-table "
            "aggregates; check it is intended)",
        ))
    return out


def assert_scalable(df: DataFrame) -> None:
    """Raise ``ValueError`` listing every FATAL finding in ``df``'s plan;
    advisory findings pass. The pre-flight gate for production pipelines."""
    bad = [f for f in audit(df) if f.fatal]
    if bad:
        raise ValueError(
            "plan fails scale audit:\n"
            + "\n".join(f"- [{f.check}] {f.detail}" for f in bad)
        )


def _main(argv: list[str]) -> int:
    """``python -m lakehouse_spark.plans.audit <sf_dir> [entry ...]`` —
    audit catalog entries' physical plans (all entries when none named).
    Exit 1 if any audited plan has a fatal finding. The CLI twin of
    :func:`assert_scalable`, for eyeballing a plan before it ships."""
    from lakehouse_spark.queries import CATALOG
    from lakehouse_spark.session import get_spark

    if not argv:
        print("usage: python -m lakehouse_spark.plans.audit <sf_dir> [entry ...]")
        return 2
    sf_dir, names = argv[0], argv[1:] or list(CATALOG)
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        print(f"unknown entries: {', '.join(unknown)}")
        return 2
    spark = get_spark(app_name="lakehouse_spark_audit")
    n_fatal = 0
    for name in names:
        try:
            findings = audit(CATALOG[name].build(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — report, keep auditing
            print(f"{name:40s} ERROR {type(ex).__name__}: {str(ex)[:120]}")
            n_fatal += 1
            continue
        if not findings:
            print(f"{name:40s} clean")
        for f in findings:
            tag = "FATAL" if f.fatal else "note"
            print(f"{name:40s} {tag:5s} [{f.check}] {f.detail}")
            n_fatal += int(f.fatal)
    return 1 if n_fatal else 0


if __name__ == "__main__":
    import sys

    raise SystemExit(_main(sys.argv[1:]))
