"""Regenerate EXPLAIN.md: the executed physical plan of every headline
query at sf0.01 (run from repo root: python scripts_gen_explain.py)."""

import io
from contextlib import redirect_stdout

from lakehouse_spark.queries import headline_queries
from lakehouse_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="explain_gen")
    lines = [
        "# Headline query plans",
        "",
        "Formatted physical plans of the bench.py headline suite at sf0.01,",
        "pre-rendered for review (regenerate: `python scripts_gen_explain.py`).",
        "The shapes asserted in tests/test_plan_quality.py — pushed filters,",
        "broadcast dims, TakeOrderedAndProject top-k, single-exchange windows,",
        "no cartesian products — are visible here verbatim.",
        "",
    ]
    from lakehouse_spark.operators.dedup import release_caches

    for name, spec in headline_queries().items():
        df = spec.build(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        release_caches()
        lines += [f"## {name}", "", "```", buf.getvalue().rstrip(), "```", ""]
    with open("EXPLAIN.md", "w") as f:
        f.write("\n".join(lines))
    print(f"EXPLAIN.md: {len(headline_queries())} plans")


if __name__ == "__main__":
    main()
