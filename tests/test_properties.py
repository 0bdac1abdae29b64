"""Property-based tests (hypothesis): structural invariants that hold for
ALL inputs, not just fixtures.

- The window-form sessionization (W1 running marker count) and the pandas
  fold (S1 aggregate_trace) must agree on turn structure for every event
  log.
- toposort output respects every edge for every random DAG.
- deep_merge: overlay precedence and base preservation for arbitrary nested
  dicts.
- first_wins dedup is idempotent and order-respecting.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_spark.plans import config

# --- config plane (no Spark: fast, many examples) ---------------------------

_nodes = st.lists(st.sampled_from("abcdefgh"), unique=True, min_size=1)


@st.composite
def _dags(draw):
    nodes = draw(_nodes)
    # edges only from later to earlier in a random order → acyclic
    order = draw(st.permutations(nodes))
    edges = {}
    for i, n in enumerate(order):
        deps = draw(
            st.lists(st.sampled_from(order[:i]) if i else st.nothing(), max_size=3)
        ) if i else []
        edges[n] = deps
    return nodes, edges


@given(_dags())
@settings(max_examples=200)
def test_toposort_respects_every_edge(dag):
    nodes, edges = dag
    out = config.toposort(nodes, edges)
    assert sorted(out) == sorted(nodes)
    pos = {n: i for i, n in enumerate(out)}
    for n, deps in edges.items():
        for d in deps:
            assert pos[d] < pos[n], f"{d} must precede {n}"


_json_scalars = st.one_of(st.integers(), st.text(max_size=5), st.booleans())
_nested = st.recursive(
    _json_scalars,
    lambda c: st.dictionaries(st.text(max_size=3), c, max_size=4),
    max_leaves=12,
)


@given(
    st.dictionaries(st.text(max_size=3), _nested, max_size=5),
    st.dictionaries(st.text(max_size=3), _nested, max_size=5),
)
@settings(max_examples=200)
def test_deep_merge_overlay_wins_and_base_survives(base, overlay):
    out = config.deep_merge(base, overlay)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            # merged recursively: every overlay leaf present
            assert config.deep_merge(base[k], v) == out[k]
        else:
            assert out[k] == v
    for k in base:
        assert k in out  # base keys never disappear


@given(st.lists(st.tuples(st.sampled_from("abc"), st.integers(0, 9))))
@settings(max_examples=200)
def test_first_wins_keeps_first_occurrence(items):
    dicts = [{"id": k, "v": v} for k, v in items]
    out = config.first_wins(dicts, "id")
    seen_ids = [d["id"] for d in out]
    assert len(seen_ids) == len(set(seen_ids))
    firsts = {}
    for k, v in items:
        firsts.setdefault(k, v)
    assert {d["id"]: d["v"] for d in out} == firsts
    assert config.first_wins(out, "id") == out  # idempotent


# --- sessionization: window form vs pandas fold (Spark: few examples) -------

_events = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.sampled_from(
            ["prompt:submit", "tool:pre", "tool:post", "thinking:delta",
             "session:end", "noise:event"]
        ),
    ),
    min_size=1,
    max_size=25,
)


@given(_events)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_window_form_agrees_with_fold(spark, seq):
    """For ANY event log: the pure-Catalyst W1 turn assignment must yield
    the same (session → number of turns with ≥1 event) as the stateful
    pandas fold, and the fold's per-turn event partitioning must cover
    exactly the events at/after each prompt marker."""
    from pyspark.sql import functions as F

    from lakehouse_spark.operators.sessionize import aggregate_trace, turn_number
    from lakehouse_spark.schemas import TRACE_EVENT

    rows = [
        (sid, f"2026-01-01T00:00:{i:02d}+00:00", "INFO", ev,
         {"prompt": "p", "tool_name": "T", "tool_input": None,
          "parallel_group_id": None, "delta": "d", "result": None}, i)
        for i, (sid, ev) in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, TRACE_EVENT)

    folded = aggregate_trace(df).groupBy("session_id").count().collect()
    fold_turns = {r.session_id: r["count"] for r in folded}

    w = turn_number(
        df, "session_id", [F.asc("encounter_seq")],
        F.col("event") == "prompt:submit",
    )
    win_turns = {
        r.session_id: r.n
        for r in w.filter(F.col("turn_id") > 0)
        .groupBy("session_id")
        .agg(F.countDistinct("turn_id").alias("n"))
        .collect()
    }
    # fold emits one turn per prompt marker (incl. trailing active)
    assert fold_turns == {k: v for k, v in win_turns.items() if v > 0}


# --- keyset pagination (Spark: few examples, structural) ---------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50)),  # (ts-ish, seq)
        min_size=1,
        max_size=30,
        unique=True,
    ),
    page=st.integers(1, 7),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_keyset_walk_equals_total_order(spark, rows, page):
    from lakehouse_spark.operators.sorts import keyset_page

    df = spark.createDataFrame(rows, "k int, seq int")
    want = sorted(rows)
    walked, after = [], None
    while True:
        got = keyset_page(df, ["k", "seq"], after, page).collect()
        if not got:
            break
        walked.extend((r.k, r.seq) for r in got)
        after = (got[-1].k, got[-1].seq)
    assert walked == want


# --- ref parsing totality + git round-trip ----------------------------------

_seg = st.text(
    alphabet="abcdefghijklmnop0123456789_-", min_size=1, max_size=8
)


@given(
    org=_seg,
    repo=_seg,
    ref=_seg,
    path_segs=st.lists(_seg, max_size=3),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_parse_ref_git_roundtrip(spark, org, repo, ref, path_segs):
    from lakehouse_spark.sources.refs import parse_ref

    url = f"https://github.com/{org}/{repo}"
    full = f"git+{url}@{ref}" + ("/" + "/".join(path_segs) if path_segs else "")
    (row,) = (
        spark.createDataFrame([(full,)], "ref string")
        .select(parse_ref("ref").alias("p"))
        .collect()
    )
    assert row.p.kind == "git"
    assert row.p.base_url == url
    assert row.p.ref_name == ref
    assert row.p.asset_path == ("/".join(path_segs) if path_segs else None)


def test_chunk_words_edges(spark):
    """Chunker edge cases: doc shorter than the window → one short chunk;
    exact multiple of stride → no empty trailing chunk; overlap covers
    every word at least once."""
    from lakehouse_spark.operators.text import chunk_words

    df = spark.createDataFrame(
        [
            (1, "a b c"),                      # shorter than window
            (2, " ".join(f"w{i}" for i in range(48))),  # 2 windows, overlap
            (3, " ".join(f"x{i}" for i in range(24))),  # == stride
        ],
        "doc_id long, text string",
    )
    out = chunk_words(df, "doc_id", "text", size=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [c.n_tokens for c in by_doc[1]] == [3]
    two = sorted(by_doc[2], key=lambda c: c.chunk_id)
    assert [c.n_tokens for c in two] == [32, 24]  # second starts at word 25
    assert two[1].chunk_text.split()[0] == "w24"
    assert [c.n_tokens for c in by_doc[3]] == [24]
    # every word of doc 2 appears in some chunk
    covered = set(w for c in two for w in c.chunk_text.split())
    assert covered == {f"w{i}" for i in range(48)}


def test_redact_pii_order_and_counts(spark):
    """SSN must be redacted before the phone pattern can half-match it;
    counts are independent per kind."""
    from lakehouse_spark.operators.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [("x", "mail a@b.co call 555-123-4567 ssn 123-45-6789 done")],
        "id string, t string",
    )
    row = df.select(
        pii_counts("t").alias("c"), redact_pii("t").alias("r")
    ).collect()[0]
    assert (row.c.email, row.c.phone, row.c.ssn) == (1, 1, 1)
    assert row.r == "mail [EMAIL] call [PHONE] ssn [SSN] done"


def test_hash_split_is_deterministic_and_proportional(spark):
    from pyspark.sql import functions as F

    from lakehouse_spark.operators.text import hash_split

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    a = hash_split(df, "k", {"train": 8, "val": 1, "test": 1})
    counts = {r.split: r.n for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.01
    # repartition-stable: same assignment regardless of physical layout
    b = hash_split(df.repartition(7), "k", {"train": 8, "val": 1, "test": 1})
    assert a.select("k", "split").exceptAll(b.select("k", "split")).isEmpty()


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=60,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    """Property: the distributed min-label propagation (with pointer-doubling
    shortcuts) must agree with a driver-side union-find on arbitrary graphs —
    including self-loops, duplicate edges, chains (deep diameters), and
    isolated nodes added via all_nodes."""
    from lakehouse_spark.operators.dedup import connected_components

    all_nodes = list(range(26))

    # reference: classic union-find
    parent = {n: n for n in all_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for n in all_nodes:
        root = find(n)
        expected[n] = min(m for m in all_nodes if find(m) == root)

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "a_id long, b_id long"
    )
    if not edges:
        pairs = pairs.limit(0)
    nodes = spark.createDataFrame([(n,) for n in all_nodes], "node long")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            pairs, "a_id", "b_id", all_nodes=nodes, node_col="node"
        ).collect()
    }
    assert got == expected


def test_mix_sources_balances_and_keeps_binding_source(spark):
    from pyspark.sql import functions as F

    from lakehouse_spark.operators.text import mix_sources

    rows = (
        [(i, "big") for i in range(3000)]
        + [(10_000 + i, "mid") for i in range(1000)]
        + [(20_000 + i, "small") for i in range(300)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sources(df, "source", "doc_id")
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["small"] == 300  # binding source keeps everything
    for s in ("big", "mid"):  # others thin toward the same share
        assert abs(counts[s] - 300) < 60, counts
    # deterministic: same survivors on a repartitioned input
    out2 = mix_sources(df.repartition(13), "source", "doc_id")
    assert out.select("doc_id").exceptAll(out2.select("doc_id")).isEmpty()


@given(
    st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)), max_size=30),
    st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)), max_size=20),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_cc_equals_full_recompute(spark, old_edges, new_edges):
    """Property: clustering old edges, then folding in new edges/nodes via
    the star contraction, must equal one full recompute over old ∪ new.
    New node ids (16-25) only exist in the new batch."""
    from lakehouse_spark.operators.dedup import (
        connected_components,
        incremental_connected_components,
    )

    def pairs_df(edges):
        df = spark.createDataFrame(edges or [(0, 0)], "a_id long, b_id long")
        return df if edges else df.limit(0)

    old_nodes = spark.createDataFrame(
        [(n,) for n in range(16)], "doc_id long"
    )
    all_nodes = spark.createDataFrame(
        [(n,) for n in range(26)], "doc_id long"
    )
    base = connected_components(
        pairs_df(old_edges), "a_id", "b_id",
        all_nodes=old_nodes, node_col="doc_id",
    )
    inc = {
        r.doc_id: r.cluster_id
        for r in incremental_connected_components(
            base, pairs_df(new_edges), "a_id", "b_id",
            new_nodes=all_nodes, node_col="doc_id",
        ).collect()
    }
    full = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            pairs_df(old_edges + new_edges), "a_id", "b_id",
            all_nodes=all_nodes, node_col="doc_id",
        ).collect()
    }
    assert inc == full


# --- gap sessions vs native session_window: property parity -------------------

_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # user
        st.integers(min_value=0, max_value=20_000),   # seconds offset
    ),
    min_size=1,
    max_size=30,
    unique=True,
)


@given(_events_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gap_sessions_equals_session_window_on_random_events(spark, evs):
    """For ANY event set, the lag-based gap sessionization must produce the
    same (user, session_start, n_events) triples as Spark's native
    session_window — including duplicate timestamps across users, bursts,
    and events exactly at the merge boundary (generated offsets hit
    multiples of the 600 s gap often enough to matter)."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from lakehouse_spark.operators.sessionize import gap_sessions

    base = datetime(2024, 1, 1)
    rows = [
        (i, f"u{u}", base + timedelta(seconds=s))
        for i, (u, s) in enumerate(sorted(evs))
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    mine = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in gap_sessions(df, "user_id", "ts", "event_id", gap_s=600).collect()
    )
    native = sorted(
        (r.user_id, r.start, r.n)
        for r in df.groupBy(F.session_window("ts", "600 seconds"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("session_window.start").alias("start"), "n")
        .collect()
    )
    assert mine == native
