"""Skew stress (SURVEY.md §7 hardening): one vertex receives ~30% of
all edges — the extreme-hub regime the north rule's salting/skew story
targets. Correctness must hold (the plans absorb hub skew via map-side
partial aggregation / broadcast parent maps), and salted_sum must agree
with the plain aggregation it replaces."""

import random

import numpy as np
from pyspark.sql import functions as F

from graphit_spark import LinkGraph
from graphit_spark.kernels import connected_components, pagerank, triangle_count
from graphit_spark.plans.traversal import salted_sum
from tests.oracles import cc_oracle, pagerank_oracle, triangle_oracle


def _hub_graph(n=400, m=4000, seed=9):
    """~30% of edges point AT vertex 0; the rest uniform."""
    rng = random.Random(seed)
    edges = []
    for _ in range(m):
        if rng.random() < 0.3:
            edges.append((rng.randrange(1, n), 0))
        else:
            edges.append((rng.randrange(n), rng.randrange(n)))
    return edges


def test_pagerank_on_extreme_hub(spark):
    edges = _hub_graph()
    g = LinkGraph.from_pairs(spark, edges, persist=False)
    got = np.zeros(g.num_vertices)
    for r in pagerank(g, max_iters=15).collect():
        got[r["id"]] = r["rank"]
    exp = pagerank_oracle(edges, iters=15)
    assert np.allclose(got, exp, atol=1e-9)
    # the hub really is extreme
    hub_share = sum(1 for _, d in edges if d == 0) / len(edges)
    assert hub_share > 0.25


def test_cc_and_tc_on_extreme_hub(spark):
    edges = _hub_graph(n=200, m=2500, seed=4)
    g = LinkGraph.from_pairs(spark, edges, persist=False)
    comp = {r["id"]: r["comp"] for r in connected_components(g).collect()}
    exp = cc_oracle(edges)
    assert comp == {v: exp[v] for v in range(len(exp))}
    tc = triangle_count(g).collect()[0]["triangles"]
    assert tc == triangle_oracle(edges)


def test_salted_sum_equals_plain_on_hub_key(spark):
    edges = _hub_graph(n=100, m=3000, seed=2)
    df = LinkGraph.from_pairs(spark, edges, persist=False).edges.withColumn(
        "one", F.lit(1)
    )
    plain = {r["dst"]: r["s"] for r in df.groupBy("dst")
             .agg(F.sum("one").alias("s")).collect()}
    salted = {r["dst"]: r["sum_one"]
              for r in salted_sum(df, "dst", "one").collect()}
    assert salted == plain


def test_gather_scatter_salted_agrees_with_plain(spark):
    """gather_scatter(salt=k) must produce the identical gathered table
    for a decomposable agg (integer sum — no float-order concerns)."""
    from graphit_spark.plans.traversal import gather_scatter

    edges = _hub_graph(n=80, m=2000, seed=7)
    g = LinkGraph.from_pairs(spark, edges, persist=False)
    state = g.vertices().withColumn("one", F.lit(1))
    plain = gather_scatter(
        g.edges, state, F.col("one"), F.sum("__msg")
    )
    salted = gather_scatter(
        g.edges, state, F.col("one"), F.sum("__msg"), salt=8
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
