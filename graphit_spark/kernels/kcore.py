"""k-core decomposition by iterative peeling.

Reference: apps/k_core.gt drives k-core with a priority queue (Julienne
buckets, SURVEY.md §2 priority_queue row). The Spark-native formulation
is synchronous peeling — repeatedly drop vertices whose degree in the
induced subgraph is < k until a fixpoint — which needs no distributed
priority queue: each round is one aggregation + semi-joins, and the
number of rounds is the peeling depth (small on web-like graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph


def k_core(graph: LinkGraph, k: int, *, max_rounds: int = 100) -> DataFrame:
    """Vertices of the k-core of the symmetrized graph: (id), every vertex
    with >= k neighbors inside the core."""
    g = graph.symmetrize()
    own_cache = g.ensure_persisted()
    keep = graph.vertices()
    keep = keep.localCheckpoint(eager=True)

    for _ in range(max_rounds):
        alive = g.edges.join(
            keep.select(F.col("id").alias("src")), "src", "left_semi"
        ).join(keep.select(F.col("id").alias("dst")), "dst", "left_semi")
        deg = alive.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("d")
        )
        new_keep = (
            keep.join(deg, "id", "left")
            .filter(F.coalesce("d", F.lit(0)) >= k)
            .select("id")
            .localCheckpoint(eager=True)
        )
        n_new = new_keep.count()
        n_old = keep.count()
        keep = new_keep
        if n_new == n_old:
            break
    if own_cache:
        g.unpersist()
    return keep
