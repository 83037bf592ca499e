"""Louvain community detection — synchronous move phase with
integer-exact modularity gains.

Blondel et al. 2008 greedily moves each vertex to the neighbor
community with the largest modularity gain. The reference has no
community kernel beyond plain LPA (apps/cc.gt's label machinery;
kernels/labelprop.py here); Louvain is the standard upgrade a web-graph
user reaches for when LPA's resolution is too coarse. This kernel is
the MOVE phase (one level) as a synchronous, deterministic fixed-budget
loop — the same contract as label_propagation (rounds-parity makes the
DuckDB twin exact). A full multi-level Louvain is this kernel composed
with ``LinkGraph.contract`` (the host_graph_rollup machinery) per
level.

Integer-exact gains: moving i into community c changes modularity by
(e_ic - k_i * tot_c / 2m) / m + const. Scaling by the positive
constant 2m and dropping per-i constants preserves the argmax, so the
score compared is

    score(i, c) = 2m * e_ic - k_i * tot'_c     (all BIGINTs)

with tot'_c = tot_c - k_i when c is i's current community (i's own
degree must not count against itself), tot_c otherwise. No float ever
enters the loop, so the twin hash-matches bit for bit. (At 10^12 edges
2m * e_ic needs ~90 bits worst-case — the documented escape is the
same computation over DECIMAL(38,0); at any tested scale BIGINT is
exact.)

Determinism: vertices move simultaneously (synchronous — the
sequential visit order of classic Louvain is not reproducible across
partitionings), but only HALF per round: in round r exactly the
vertices with id % 2 == r % 2 are move-eligible. Plain synchronous
moves oscillate (two mutually-best vertices swap communities forever —
the barbell graph demonstrates it); parity-alternation is the standard
deterministic symmetry breaker in distributed Louvain/LPA variants and
costs nothing (the ineligible half keeps its community through the
same select). Argmax ties break to the smaller community id; the
stay option competes as a real candidate (a synthetic zero-edge stay
row guarantees it exists even when i has no intra-community edge, and
a groupBy max folds it away when the real one is present). The fixed
round budget is shared with the twin, so the output is exact either
way.

Spark plan per round (the LPA shape, one extra V-sized join): one
E-sized edge ⋈ community join feeding a map-side-combined
groupBy(dst, c) count, one V-sized community-degree aggregate, V-sized
candidate joins, and a max_by argmax — every aggregate partial, no
driver action but the round counter, state localCheckpointed and the
superseded checkpoint released.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph


def louvain_move(
    graph: LinkGraph,
    *,
    rounds: int = 6,
    symmetrize: bool = True,
) -> DataFrame:
    """Returns (id, community) after `rounds` synchronous Louvain move
    rounds over the symmetrized simple graph; community ids are vertex
    ids (each vertex starts in its own singleton)."""
    g = graph.symmetrize() if symmetrize else graph
    own_cache = g.ensure_persisted()
    two_m = g.num_edges  # sym rows = 2m undirected edges

    # vertex universe from the ORIGINAL graph — symmetrize() keeps
    # num_vertices, but the degree join below must still cover every
    # vertex (isolated ones get k = 0 and stay in their singleton)
    deg = (
        graph.vertices()
        .select("id")
        .join(g.out_degrees(), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("out_degree"), F.lit(0))
            .cast("long")
            .alias("k"),
        )
    )
    deg = deg.localCheckpoint(eager=True)

    comm = deg.select("id", F.col("id").alias("c"), "k")
    comm = comm.localCheckpoint(eager=True)

    for r in range(1, rounds + 1):
        tot = comm.groupBy("c").agg(F.sum("k").alias("tot"))
        # e_ic: edges from i into community c (neighbor communities)
        e_ic = (
            g.edges.join(
                comm.select(F.col("id").alias("dst"), "c"), "dst"
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # synthetic stay row (cnt = 0) so every vertex has its current
        # community as a candidate even with no intra-community edge
        stay = comm.select("id", "c", F.lit(0).cast("long").alias("cnt"))
        cand = (
            e_ic.unionByName(stay)
            .groupBy("id", "c")
            .agg(F.max("cnt").alias("cnt"))
            .join(tot, "c")
            .join(comm.select("id", F.col("c").alias("cur"), "k"), "id")
            .select(
                "id",
                "c",
                (
                    F.lit(two_m) * F.col("cnt")
                    - F.col("k")
                    * F.when(
                        F.col("c") == F.col("cur"),
                        F.col("tot") - F.col("k"),
                    ).otherwise(F.col("tot"))
                ).alias("score"),
            )
        )
        best = cand.groupBy("id").agg(
            F.max_by(
                "c", F.struct(F.col("score"), (-F.col("c")).alias("neg"))
            ).alias("new_c")
        )
        new_comm = (
            comm.join(best, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("id") % 2 == F.lit(r % 2),
                    F.coalesce("new_c", F.col("c")),
                )
                .otherwise(F.col("c"))
                .alias("c"),
                "k",
            )
            .localCheckpoint(eager=True)
        )
        comm.unpersist()
        comm = new_comm

    out = comm.select("id", F.col("c").alias("community"))
    deg.unpersist()
    if own_cache:
        g.unpersist()
    return out
