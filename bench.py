"""Benchmark runner: times the headline catalog queries end-to-end.

Runs every ``headline=True`` entry of `lakehouse_spark.queries.CATALOG` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_suite_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is timed over a full execution (plan + shuffle + collect of the
result rows — results are small aggregates, so collect cost is negligible and
the measured time is dominated by scan/shuffle/agg work, which is what scales).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_spark.queries import headline_queries  # noqa: E402
from lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="lakehouse_spark_bench")
    suite = headline_queries()

    # Warm-up: execute the first query fully once (collect, not count —
    # count() skips the aggregate pipeline, leaving whole-stage-codegen
    # compilation inside the first TIMED measurement). Steady-state per-query
    # times are what the 2x-vs-anchor comparison is meant to capture.
    first = next(iter(suite.values()))
    first.build(spark, sf_dir).collect()

    from lakehouse_spark.operators.dedup import release_caches

    # One failing query must not take down the whole bench (round 2's
    # BENCH_r02 was rc=1/parsed=null because a single query threw): record
    # the error, keep timing the rest, and ALWAYS print the JSON line.
    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    kept: dict[str, list] = {}
    t_suite = time.perf_counter()
    for name, spec in suite.items():
        t0 = time.perf_counter()
        try:
            rows = spec.build(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
            if name == "sim_topk_bruteforce":
                kept[name] = rows
        except Exception as ex:  # noqa: BLE001 — survive any query failure
            timings[name] = None
            errors[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
        release_caches()  # dedup intermediates don't outlive their query
    total = round(time.perf_counter() - t_suite, 3)

    # IVF quality: recall@5 of the learned-centroid approximate index
    # against the exact brute-force neighbors (same queries, same k).
    from lakehouse_spark.queries import CATALOG

    try:
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in kept.get("sim_topk_bruteforce", [])
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in CATALOG["sim_ivf_topk"].build(spark, sf_dir).collect()
        }
        ivf_recall = (
            round(len(approx & truth) / len(truth), 4) if truth else None
        )
    except Exception as ex:  # noqa: BLE001
        ivf_recall = None
        errors["sim_ivf_topk"] = f"{type(ex).__name__}: {str(ex)[:200]}"

    out = {
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "ivf_recall_at_5": ivf_recall,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
