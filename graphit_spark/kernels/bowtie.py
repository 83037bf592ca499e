"""Bow-tie decomposition of a directed web graph (Broder et al.,
"Graph structure in the Web", WWW 2000) — the canonical Common-Crawl
structure analysis: classify every vertex relative to the largest
strongly connected component (the CORE) as

    CORE          largest SCC (ties broken by min SCC label)
    IN            reaches the core, not in it
    OUT           reachable from the core, not in it
    TUBE          on an IN -> OUT path that bypasses the core
    TENDRIL       hangs off IN (reachable from IN) or feeds OUT
                  (reaches OUT) without touching the core
    DISCONNECTED  none of the above

The reference has no directed-reachability app (apps/ covers weakly
connected components only, apps/cc.gt); this composes the round-3 SCC
kernel (kernels/scc.py, FW-BW min-label peel) with four multi-source
reachability fixpoints — the same ``edges.from(frontier)`` contract as
BFS (apps/bfs.gt, plans/traversal.py) minus the distance payload.

Correct class algebra (why four reachability runs suffice): let
F = fwd-reach(core), B = bwd-reach(core). A vertex that both reaches
the core and is reached by it is mutually reachable with it, hence IN
and OUT are disjoint. A path from IN to an unclassified vertex v can
never pass through the core (that would put v in OUT), so
fwd-reach(IN) restricted to unclassified vertices is exactly the
core-bypassing reach Broder's TUBE/TENDRIL definitions need — no
"graph minus core" rebuild is required. With FI = fwd-reach(IN),
BO = bwd-reach(OUT): TUBE = FI cap BO, TENDRIL = (FI cup BO) - TUBE,
DISCONNECTED = the rest, all over unclassified vertices only.

Spark plan / 100 TB shape: the SCC peel dominates (see scc.py). Each
reachability is a BFS-shaped frontier loop — per round one semi-join
restricted edge scan, a distinct, an anti-join against the reached
set, one localCheckpoint and ONE driver action (the new-frontier
count); direction switches sparse/dense at the Ligra 1/20 threshold
with the frontier degree sum estimated as size x avg-degree (no extra
scalar action per round, same rule as scc.py). Classification is five
V-sized left joins producing one CASE column — no shuffle wider than
V. Nothing driver-side ever holds more than a scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph
from graphit_spark.plans.state import fresh_checkpoint
from graphit_spark.kernels.scc import strongly_connected_components
from graphit_spark.plans.traversal import choose_direction


def _reachable(
    edges: DataFrame,
    seeds: DataFrame,
    seed_count: int,
    num_edges: int,
    num_verts: int,
    max_iters: int,
) -> DataFrame:
    """All vertex ids reachable from `seeds` along directed `edges`,
    seeds included. Returns a localCheckpointed single-column ``id``
    DataFrame the caller must unpersist. Raises if the fixpoint does
    not empty its frontier within max_iters (an incomplete reach set
    would silently misclassify TUBE/TENDRIL vertices)."""
    avg_deg = max(num_edges / max(num_verts, 1), 1.0)
    reached = seeds.select("id").transform(fresh_checkpoint)
    frontier = reached
    fsize = seed_count
    for _ in range(max_iters):
        if fsize == 0:
            return reached
        direction = choose_direction(
            fsize, int(fsize * avg_deg), num_edges
        )
        fr = frontier.select(F.col("id").alias("src"))
        active = edges.join(
            F.broadcast(fr) if direction == "sparse" else fr,
            "src",
            "left_semi",
        )
        new = (
            active.select(F.col("dst").alias("id"))
            .distinct()
            .join(reached, "id", "left_anti")
            .transform(fresh_checkpoint)
        )
        fsize = new.count()
        if fsize == 0:
            new.unpersist()
            return reached
        grown = reached.unionByName(new).transform(fresh_checkpoint)
        if frontier is not reached:
            frontier.unpersist()
        reached.unpersist()
        reached, frontier = grown, new
    raise RuntimeError(
        f"reachability fixpoint did not converge within {max_iters} "
        "rounds — raise max_iters above the graph's directed diameter"
    )


def bowtie_classes(
    graph: LinkGraph, *, max_iters: int = 100, **scc_kw
) -> DataFrame:
    """(id, bowtie) for every vertex: bowtie in {CORE, IN, OUT, TUBE,
    TENDRIL, DISCONNECTED} relative to the largest SCC (ties on size
    broken by the smaller SCC label — a total order, so the output is
    deterministic)."""
    own_cache = graph.ensure_persisted()
    num_edges = graph.num_edges
    num_verts = graph.num_vertices

    scc = strongly_connected_components(graph, **scc_kw).localCheckpoint(
        eager=True
    )
    core_row = (
        scc.groupBy("scc")
        .count()
        .orderBy(F.desc("count"), F.asc("scc"))
        .first()
    )
    core_label = int(core_row["scc"])
    core_size = int(core_row["count"])
    corev = (
        scc.filter(F.col("scc") == core_label)
        .select("id")
        .transform(fresh_checkpoint)
    )
    scc.unpersist()

    edges = graph.edges.select("src", "dst").transform(fresh_checkpoint)
    tedges = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).transform(fresh_checkpoint)

    fwd = _reachable(edges, corev, core_size, num_edges, num_verts, max_iters)
    bwd = _reachable(tedges, corev, core_size, num_edges, num_verts, max_iters)
    inn = bwd.join(corev, "id", "left_anti").transform(fresh_checkpoint)
    outt = fwd.join(corev, "id", "left_anti").transform(fresh_checkpoint)
    n_in, n_out = inn.count(), outt.count()
    fi = _reachable(edges, inn, n_in, num_edges, num_verts, max_iters)
    bo = _reachable(tedges, outt, n_out, num_edges, num_verts, max_iters)

    def flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("id", F.lit(True).alias(name))

    out = (
        graph.vertices()
        .select("id")
        .join(flag(corev, "is_core"), "id", "left")
        .join(flag(bwd, "is_b"), "id", "left")
        .join(flag(fwd, "is_f"), "id", "left")
        .join(flag(fi, "is_fi"), "id", "left")
        .join(flag(bo, "is_bo"), "id", "left")
        .select(
            "id",
            F.when(F.col("is_core"), F.lit("CORE"))
            .when(F.col("is_b"), F.lit("IN"))
            .when(F.col("is_f"), F.lit("OUT"))
            .when(F.col("is_fi") & F.col("is_bo"), F.lit("TUBE"))
            .when(F.col("is_fi") | F.col("is_bo"), F.lit("TENDRIL"))
            .otherwise(F.lit("DISCONNECTED"))
            .alias("bowtie"),
        )
        .transform(fresh_checkpoint)
    )
    for df in (corev, edges, tedges, fwd, bwd, inn, outt, fi, bo):
        df.unpersist()
    if own_cache:
        graph.unpersist()
    return out
