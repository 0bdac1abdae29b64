"""Mention-resolution pipeline (T1-T3/J8/D1), rollup operators, and the
ST5 conditional unread-mark sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark.mutation.store import TableStore
from lakehouse_spark.plans import mentions
from lakehouse_spark.streaming.live import mark_unread_sink


def test_quote_mention(spark):
    df = spark.createDataFrame(
        [("docs/plan.md",), ("my file.md",), ("a:b/c.txt",)], "p string"
    )
    got = [r.m for r in df.select(mentions.quote_mention("p").alias("m")).collect()]
    assert got == ["@docs/plan.md", '@"my file.md"', "@a:b/c.txt"]


DOCS = [
    ("root.md", 'see @a.md and @"deep file.md" plus `@code.md` ignored'),
    ("a.md", "chain to @b.md"),
    ("b.md", "cycle back to @root.md"),  # cycle must terminate
    ("deep file.md", "same body"),
    ("twin.md", "same body"),  # identical content, different path
    ("island.md", "@nowhere.md unreachable from root"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "path string, content string")


def test_mention_edges(spark):
    edges = {
        (r.src, r.dst) for r in mentions.mention_edges(
            _docs(spark), "path", "content"
        ).collect()
    }
    assert ("root.md", "a.md") in edges
    assert ("root.md", "deep file.md") in edges  # quoted form
    assert ("root.md", "code.md") not in edges  # inline code stripped
    assert ("b.md", "root.md") in edges


def test_resolve_mentions_bfs_dedup(spark):
    roots = spark.createDataFrame([("root.md",)], "node string")
    out = mentions.resolve_mentions(_docs(spark), roots, "path", "content")
    rows = {tuple(r.paths): (r.min_depth, r.content) for r in out.collect()}
    # island.md unreachable; twin.md reached only if mentioned — it isn't,
    # so 'same body' is loaded once via deep file.md
    all_paths = {p for ps in rows for p in ps}
    assert all_paths == {"root.md", "a.md", "b.md", "deep file.md"}
    depths = {ps: d for ps, (d, _) in rows.items()}
    assert depths[("root.md",)] == 0
    assert depths[("a.md",)] == 1
    assert depths[("deep file.md",)] == 1
    assert depths[("b.md",)] == 2


def test_resolve_mentions_credits_identical_content(spark):
    # make twin.md reachable too → one row with both paths credited
    docs = _docs(spark).union(
        spark.createDataFrame([("root2.md", '@"deep file.md" @twin.md')],
                              "path string, content string")
    )
    roots = spark.createDataFrame([("root2.md",)], "node string")
    out = mentions.resolve_mentions(docs, roots, "path", "content")
    by_content = {r.content: r for r in out.collect()}
    same = by_content["same body"]
    assert list(same.paths) == ["deep file.md", "twin.md"]
    assert same.n_copies == 2


def test_mark_unread_sink(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "sessions"), key="session_id")
    store.init(
        spark.createDataFrame(
            [("s1", False), ("s2", False), ("s3", True), ("s4", False)],
            "session_id string, is_unread boolean",
        )
    )
    batch = spark.createDataFrame(
        [("s1",), ("s2",), ("s3",)], "session_id string"
    )  # s4 untouched
    sink = mark_unread_sink(store, subscribed_sessions={"s2"})
    sink(batch, 0)
    got = {r.session_id: r.is_unread for r in store.read().collect()}
    # s1: touched, read, unsubscribed → flips; s2 subscribed → stays read;
    # s3 already unread → unchanged; s4 untouched → unchanged
    assert got == {"s1": True, "s2": False, "s3": True, "s4": False}


def test_time_bucket_rollup_streaming_compatible(spark, tmp_path):
    """The rollup expression must run under readStream unchanged."""
    import json

    from lakehouse_spark.operators import rollup

    d = tmp_path / "ev"
    d.mkdir()
    (d / "x.jsonl").write_text(
        "\n".join(
            json.dumps(
                {"ts": f"2026-01-01T0{h}:15:00Z", "event_type": "click", "value": 1.0}
            )
            for h in range(4)
        )
    )
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).json(str(d))
    agg = rollup.time_bucket_rollup(
        stream.withWatermark("ts", "1 hour"),
        "ts",
        "2 hours",
        ["event_type"],
        [F.count("*").alias("n")],
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r.bucket_start.hour): r.n
        for r in spark.sql("SELECT * FROM rollup_stream").collect()
    }
    assert got == {0: 2, 2: 2}
