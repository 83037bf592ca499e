"""Connected components — min-label propagation with pointer-jump shortcut.

Semantics match reference apps/cc.gt (plain label propagation) and
apps/cc_lp_pj.gt (label propagation + pointer-jumping):

    init:      IDs[v] = v                              (cc.gt init)
    propagate: IDs[dst] min= IDs[src] over all edges   (cc.gt updateEdge)
    shortcut:  IDs[v] = IDs[IDs[v]] until stable       (cc_lp_pj.gt pjump)
    repeat until no label changes (frontier empty).

The reference traverses the directed edges as stored and relies on GAPBS
symmetrizing undirected inputs (-s); we symmetrize explicitly so
components are the weakly-connected fixpoint — cc_verifier.cpp checks only
the converged state, and BSP vs async iteration order doesn't change it.

Spark plan per round: frontier-restricted gather (min) + change-tracking
join produces the next frontier (change_tracking_lower.cpp:38-75); the
pointer-jump rounds are label⋈label self-joins that halve path lengths,
turning O(diameter) propagation into O(log n) rounds on long chains.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from graphit_spark.graph import LinkGraph
from graphit_spark.checkpoint import SnapshotStore
from graphit_spark.plans.traversal import choose_direction


def connected_components(
    graph: LinkGraph,
    *,
    symmetrize: bool = True,
    pointer_jump: bool = True,
    max_iters: int = 200,
    store: SnapshotStore | None = None,
    resume: bool = False,
) -> DataFrame:
    """Returns (id, comp) where comp = min vertex id in the component.

    Converges when a propagation round changes no label (frontier empty,
    cc.gt main loop). With pointer_jump=True each round also shortcuts
    labels through their parents until stable (cc_lp_pj.gt:21-28), which
    bounds rounds by O(log n) instead of O(diameter).
    """
    g = graph.symmetrize() if symmetrize else graph
    num_edges = g.num_edges

    start_iter = 0
    if resume and store is not None and store.latest() is not None:
        start_iter = store.latest() + 1
        labels = store.read(g.spark, store.latest())
        frontier = labels.select("id")  # conservative: all active
    else:
        labels = graph.vertices().select("id", F.col("id").alias("comp"))
        frontier = labels.select("id")
    labels = labels.localCheckpoint(eager=True)
    frontier_size = graph.num_vertices
    # degree sum of full frontier = num_edges (dense round 0)
    frontier_deg_sum = num_edges

    for i in range(start_iter, max_iters):
        t0 = time.time()
        direction = choose_direction(frontier_size, frontier_deg_sum, num_edges)
        src_labels = labels.select(F.col("id").alias("src"), "comp")
        if direction == "sparse":
            # push-like: only frontier sources propagate.
            active_edges = g.edges.join(
                F.broadcast(frontier.select(F.col("id").alias("src"))),
                "src",
                "left_semi",
            )
        else:
            active_edges = g.edges.join(
                frontier.select(F.col("id").alias("src")), "src", "left_semi"
            )
        mins = (
            active_edges.join(src_labels, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        new_labels = (
            labels.join(mins, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nbr_min", F.col("comp"))).alias(
                    "comp"
                ),
                F.col("comp").alias("old_comp"),
            )
        )
        if pointer_jump:
            # Path-halving: comp[v] <- comp[comp[v]], repeated. Each Spark
            # round is one hop; a handful of rounds collapses chains.
            for _ in range(2):
                left = new_labels.alias("l")
                parent = new_labels.select(
                    F.col("id").alias("pid"), F.col("comp").alias("pcomp")
                ).alias("p")
                new_labels = left.join(
                    parent, F.col("l.comp") == F.col("p.pid"), "left"
                ).select(
                    F.col("l.id").alias("id"),
                    F.coalesce(F.col("p.pcomp"), F.col("l.comp")).alias("comp"),
                    F.col("l.old_comp").alias("old_comp"),
                )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("comp") != F.col("old_comp")).select("id")
        # next frontier = changed vertices (applyModified contract)
        stats = (
            changed.join(g.out_degrees(), "id", "left")
            .agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("out_degree"), F.lit(0)).alias("degsum"),
            )
            .collect()[0]
        )
        frontier_size, frontier_deg_sum = int(stats["n"]), int(stats["degsum"])
        if store is not None:
            store.write(
                new_labels.select("id", "comp"),
                i,
                {
                    "kernel": "cc",
                    "elapsed_sec": time.time() - t0,
                    "frontier_size": frontier_size,
                    "direction": direction,
                },
            )
        labels = new_labels.select("id", "comp")
        frontier = changed
        if frontier_size == 0:
            break

    return labels.select("id", "comp")
