"""Regenerate CATALOG.md from the live query registry (run from repo root:
python scripts_gen_catalog.py)."""

from collections import OrderedDict

from lakehouse_spark.queries import CATALOG

GROUPS = OrderedDict(
    [
        ("TPC-H shapes", lambda n: n.startswith(("tpch", "flagship"))),
        ("Similarity / ANN", lambda n: n.startswith(("sim_", "emb_"))),
        ("Search / hybrid retrieval", lambda n: n.startswith("search_")),
        ("Text analysis", lambda n: n.startswith("text_")),
        ("Dedup family", lambda n: n.startswith("dedup_")),
        ("Curation pipeline", lambda n: n.startswith(
            ("curation_", "pipeline_", "pack_", "pii_", "doc_", "profile_"))),
        ("Rollups / time series", lambda n: n.startswith("rollup_")),
        ("Graph algorithms", lambda n: n.startswith("graph_")),
        ("Data layout / skew / sources", lambda n: n.startswith(
            ("layout_", "skew_", "sc"))),
        ("Multimodal", lambda n: n.startswith("mm_")),
        ("Scheduling", lambda n: n.startswith(("cr1", "cron"))),
        ("Aggregations (A-series + agg_)", lambda n: n.startswith("agg_")
         or (n[0] == "a" and n[1:2].isdigit())),
        ("Filters / projections (F-series)",
         lambda n: n[0] == "f" and n[1:2].isdigit()),
        ("Joins / recursion (J-series)", lambda n: n.startswith("j")),
        ("Sessionization (S-series + trace)", lambda n: n.startswith("trace")
         or (n[0] == "s" and n[1:2].isdigit())),
        ("Windows (W-series)", lambda n: n[0] == "w" and n[1:2].isdigit()),
        ("Sorts / pagination (O-series)",
         lambda n: n[0] == "o" and n[1:2].isdigit()),
        ("Set ops / dedup (D-series)",
         lambda n: n[0] == "d" and n[1:2].isdigit()),
        ("Scalar functions (T-series)",
         lambda n: n[0] == "t" and n[1:3].rstrip("_").isdigit()
         or (n[0] == "t" and n[1:2].isdigit())),
    ]
)


def main() -> None:
    lines = [
        "# Query catalog",
        "",
        f"{len(CATALOG)} entries. Every entry is a (Spark builder, DuckDB oracle)",
        "pair over the driver testdata; `(rows-only)` marks the entries whose",
        "semantics have no SQL oracle (approximate / iterative / nondeterministic",
        "by design) — each of those is pinned by pytest instead. Regenerate with",
        "`python scripts_gen_catalog.py`.",
        "",
    ]
    seen: set[str] = set()
    for title, pred in GROUPS.items():
        names = [n for n in sorted(CATALOG) if n not in seen and pred(n)]
        if not names:
            continue
        seen.update(names)
        lines += [f"## {title}", ""]
        for n in names:
            spec = CATALOG[n]
            tag = "" if spec.oracle is not None else " *(rows-only)*"
            star = " **[headline]**" if spec.headline else ""
            doc = " ".join((spec.doc or "").split())
            lines.append(f"- `{n}`{tag}{star} — {doc}")
        lines.append("")
    rest = [n for n in sorted(CATALOG) if n not in seen]
    if rest:
        lines += ["## Other", ""]
        for n in rest:
            lines.append(f"- `{n}` — {' '.join((CATALOG[n].doc or '').split())}")
        lines.append("")
    with open("CATALOG.md", "w") as f:
        f.write("\n".join(lines))
    print(f"CATALOG.md: {len(CATALOG)} entries")


if __name__ == "__main__":
    main()
