"""Unit tests for the gather-scatter traversal core (plans/traversal.py)."""

from pyspark.sql import functions as F

from graphit_spark import LinkGraph
from graphit_spark.plans.traversal import (
    choose_direction,
    gather_scatter,
    salted_sum,
    track_changes,
)


def test_choose_direction_threshold():
    # reference: pull iff m + outDegrees > numEdges / 20
    assert choose_direction(1, 1, 1000) == "sparse"
    assert choose_direction(30, 30, 1000) == "dense"
    assert choose_direction(0, 51, 1000) == "dense"


def test_gather_scatter_matches_manual_pr_step(spark, golden_edges):
    g = LinkGraph.from_pairs(spark, golden_edges, persist=False)
    state = g.out_degrees().withColumn("rank", F.lit(1.0 / g.num_vertices))
    got = gather_scatter(
        g.edges,
        state.filter(F.col("out_degree") > 0),
        message=F.col("rank") / F.col("out_degree"),
        agg=F.sum("__msg"),
    )
    manual = (
        g.edges.join(
            state.filter(F.col("out_degree") > 0).select(
                F.col("id").alias("src"),
                (F.col("rank") / F.col("out_degree")).alias("c"),
            ),
            "src",
        )
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("c").alias("gathered"))
    )
    a = {r["id"]: r["gathered"] for r in got.collect()}
    b = {r["id"]: r["gathered"] for r in manual.collect()}
    assert a == b


def test_gather_scatter_frontier_sparse_and_dense_agree(spark, golden_edges):
    g = LinkGraph.from_pairs(spark, golden_edges, persist=False)
    state = g.vertices().withColumn("val", F.col("id") + 10)
    frontier = g.vertices().filter(F.col("id") % 3 == 0)
    outs = []
    for direction in ("sparse", "dense", "dense_forward", "dense_pull"):
        got = gather_scatter(
            g.edges,
            state,
            message=F.col("val"),
            agg=F.min("__msg"),
            frontier=frontier,
            direction=direction,
        )
        outs.append({r["id"]: r["gathered"] for r in got.collect()})
    # GraphIt's DensePush (forward) and DensePull modes collapse to the
    # same join+groupBy plan here — every direction agrees exactly
    assert all(o == outs[0] for o in outs[1:])


def test_salted_sum_equals_plain_sum(spark):
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("k"), F.lit(1).alias("v")
    )
    salted = {r["k"]: r["sum_v"] for r in salted_sum(df, "k", "v").collect()}
    plain = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert salted == plain


def test_track_changes(spark):
    old = spark.createDataFrame([(0, 5), (1, 7), (2, 9)], "id long, x long")
    new = spark.createDataFrame([(0, 5), (1, 6), (2, 8)], "id long, x long")
    changed = sorted(r["id"] for r in track_changes(old, new, "x").collect())
    assert changed == [1, 2]


def test_track_changes_null_transitions(spark):
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(0, None), (1, 5), (2, None), (3, 7)], "id long, x long"
    )
    new = spark.createDataFrame(
        [(0, 3), (1, 5), (2, None), (3, 6)], "id long, x long"
    )
    changed = sorted(
        r["id"] for r in track_changes(old, new, "x").collect()
    )
    assert changed == [0, 3]  # NULL->3 counts; NULL->NULL and 5->5 don't
