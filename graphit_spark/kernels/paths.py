"""Frontier-driven path kernels: BFS and SSSP (Bellman-Ford).

Reference: apps/bfs.gt (parent array via applyModified) and apps/sssp.gt
(Bellman-Ford: ``SP[dst] min= SP[src] + weight`` over frontier out-edges
until the frontier empties). These are the canonical users of the
``edges.from(frontier).applyModified(f, field)`` contract
(change-tracking, src/midend/change_tracking_lower.cpp), exercised here
through the frontier/direction machinery in plans/traversal.py.

We compute distances (hop count for BFS) rather than parent pointers —
parent arrays are nondeterministic under parallel CAS in the reference;
distance fixpoints are exact and verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from graphit_spark.graph import LinkGraph
from graphit_spark.plans.state import fresh_checkpoint
from graphit_spark.plans.traversal import choose_direction


def _min_distance_fixpoint(
    graph: LinkGraph, source: int, dist_expr, max_iters: int,
    threshold_fraction: int = 20,
) -> DataFrame:
    """Shared driver loop: dist[dst] min= dist[src] + cost(edge).

    threshold_fraction: the sparse/dense direction-switch denominator
    (reference default 20, gen_edge_apply_func_decl.cpp:722) — exposed
    as a schedule knob for graphit_spark.tune."""
    own_cache = graph.ensure_persisted()
    num_edges = graph.num_edges
    inf = None  # represented as NULL = unreached
    dist = graph.vertices().select(
        "id",
        F.when(F.col("id") == source, F.lit(0).cast("long")).otherwise(
            F.lit(inf).cast("long")
        ).alias("dist"),
    )
    dist = dist.transform(fresh_checkpoint)
    prev_ck = dist  # superseded checkpoints are released each round
    frontier = dist.filter(F.col("dist").isNotNull()).select("id")
    frontier_size, frontier_deg = 1, 0

    for _ in range(max_iters):
        direction = choose_direction(
            frontier_size, frontier_deg, num_edges, threshold_fraction
        )
        f_src = frontier.select(F.col("id").alias("src"))
        active = graph.edges.join(
            F.broadcast(f_src) if direction == "sparse" else f_src,
            "src",
            "left_semi",
        )
        cand = (
            active.join(
                dist.filter(F.col("dist").isNotNull()).select(
                    F.col("id").alias("src"), F.col("dist").alias("sdist")
                ),
                "src",
            )
            .select(F.col("dst").alias("id"), dist_expr.alias("cand"))
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        new_dist = (
            dist.join(cand, "id", "left")
            .select(
                "id",
                F.least(
                    F.coalesce("dist", F.lit(2**62)),
                    F.coalesce("cand", F.lit(2**62)),
                ).alias("nd"),
                F.col("dist").alias("old"),
            )
            .select(
                "id",
                F.when(F.col("nd") < 2**62, F.col("nd")).alias("dist"),
                "old",
            )
            .transform(fresh_checkpoint)
        )
        changed = new_dist.filter(
            F.col("dist").isNotNull()
            & (F.col("old").isNull() | (F.col("dist") < F.col("old")))
        ).select("id")
        # degree sum only matters below the Ligra size threshold — the
        # V-sized degree join is skipped on dense rounds (same rule as
        # kernels/components.py)
        frontier_size = changed.count()
        if frontier_size > num_edges / threshold_fraction:
            frontier_deg = num_edges
        else:
            frontier_deg = int(
                changed.join(graph.out_degrees(), "id", "left")
                .agg(F.coalesce(F.sum("out_degree"), F.lit(0)).alias("d"))
                .collect()[0]["d"]
            )
        dist = new_dist.select("id", "dist")
        frontier = changed
        prev_ck.unpersist()
        prev_ck = new_dist
        if frontier_size == 0:
            break
    if own_cache:
        graph.unpersist()  # dist is checkpointed; cache no longer needed
    return dist


def bfs(
    graph: LinkGraph, source: int = 0, *, max_iters: int = 500,
    threshold_fraction: int = 20,
) -> DataFrame:
    """(id, dist) hop distances from source; NULL dist = unreachable."""
    return _min_distance_fixpoint(
        graph, source, F.col("sdist") + F.lit(1), max_iters,
        threshold_fraction,
    )


def sssp(
    graph: LinkGraph, source: int = 0, *, max_iters: int = 500,
    threshold_fraction: int = 20,
) -> DataFrame:
    """Bellman-Ford shortest paths over the weighted edge table
    (apps/sssp.gt); requires graph.weighted."""
    if not graph.weighted:
        raise ValueError("sssp requires a weighted graph (src, dst, weight)")
    return _min_distance_fixpoint(
        graph, source, F.col("sdist") + F.col("weight"), max_iters,
        threshold_fraction,
    )
