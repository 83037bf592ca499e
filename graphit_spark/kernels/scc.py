"""Strongly connected components — forward/backward min-label peeling.

The reference ships weakly-connected components only (apps/cc.gt,
apps/cc_lp_pj.gt; GAPBS cc.cc + cc_verifier); for a directed web link
graph the bowtie decomposition needs SCC. This kernel extends the same
min-label propagation machinery (kernels/components.py) to directed
MUTUAL reachability via the classic FW-BW refinement (Fleischer/
Hendrickson/Pinar divide-and-conquer SCC; the Pregel "coloring"
variant): per outer round, over the still-unassigned subgraph,

    F(v) = min id with a directed path to v   (forward min fixpoint)
    B(v) = min id v has a directed path to    (same, on the transpose)

and every vertex with F(v) == B(v) == c is assigned scc = c: F(v)=c
means c reaches v and B(v)=c means v reaches c, so the match is
mutual reachability with c — SOUND EVEN BEFORE THE FIXPOINT CONVERGES
(a label value is only ever copied along real edges, so lab(v)=u
always witnesses a real path u ->* v; early-stopped propagation just
matches fewer vertices and costs an extra outer round, never assigns
a wrong SCC). The minimum unassigned id always matches itself, so
every outer round peels at least one whole SCC, and removing whole
SCCs can never split another (every vertex on a v -> w path between
mutually-reachable v, w is itself in their SCC) — the peel is exact.

Spark plan per propagation round: the frontier-restricted gather join
+ min aggregate of connected_components (direction switch at the Ligra
1/20 threshold, shuffle-hash V-side build on big graphs, one E-scan
per round); per outer round two semi-joins shrink the edge table to
the unassigned subgraph and are checkpointed so later rounds rescan
only the residual graph (the FW-BW work bound), never the full crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph
from graphit_spark.plans.traversal import choose_direction


def _min_reach_fixpoint(
    edges: DataFrame,
    verts: DataFrame,
    degs: DataFrame,
    num_edges: int,
    num_verts: int,
    big_v: bool,
    max_iters: int,
) -> DataFrame:
    """(id, lab) fixpoint of lab[dst] min= lab[src] over directed
    `edges`, starting from lab = id. Frontier-restricted exactly like
    connected_components' propagation loop (one E-scan per round);
    `degs` is the (src, deg) table of THIS edge set, used for the
    Ligra direction threshold."""
    labels = verts.select("id", F.col("id").alias("lab")).localCheckpoint(
        eager=True
    )
    frontier = labels.select("id")
    frontier_size = num_verts
    frontier_deg_sum = num_edges
    prev = labels
    for _ in range(max_iters):
        direction = choose_direction(frontier_size, frontier_deg_sum, num_edges)
        src_labels = labels.select(F.col("id").alias("src"), "lab")
        if direction == "sparse":
            fr = frontier.select(F.col("id").alias("src"))
            active = edges.join(F.broadcast(fr), "src", "left_semi")
            src_labels = F.broadcast(src_labels.join(F.broadcast(fr), "src"))
        else:
            active = edges
            if frontier_size < num_verts:
                src_labels = src_labels.join(
                    frontier.select(F.col("id").alias("src")), "src", "left_semi"
                )
            if big_v:
                src_labels = src_labels.hint("shuffle_hash")
        mins = (
            active.join(src_labels, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lab").alias("cand"))
        )
        new_labels = (
            labels.join(mins, "id", "left")
            .select(
                "id",
                F.least(F.col("lab"), F.coalesce("cand", F.col("lab"))).alias(
                    "lab"
                ),
                (F.coalesce("cand", F.col("lab")) < F.col("lab")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").select("id")
        frontier_size = changed.count()
        prev.unpersist()
        prev = new_labels
        labels = new_labels.select("id", "lab")
        frontier = changed
        if frontier_size == 0:
            break
        if frontier_size > num_edges / 20:
            frontier_deg_sum = num_edges
        else:
            frontier_deg_sum = int(
                changed.join(degs, changed["id"] == degs["src"], "left")
                .agg(F.coalesce(F.sum("deg"), F.lit(0)).alias("d"))
                .collect()[0]["d"]
            )
    return labels


def strongly_connected_components(
    graph: LinkGraph,
    *,
    max_outer: int = 30,
    max_prop: int = 100,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Returns (id, scc) for every vertex in [0, n); scc = min vertex
    id of the strongly connected component (trivial SCCs map to the
    vertex itself)."""
    own_cache = graph.ensure_persisted()
    verts = graph.vertices().select("id").localCheckpoint(eager=True)
    edges = graph.edges.select("src", "dst").localCheckpoint(eager=True)
    n_active = graph.num_vertices
    assigned_parts: list[DataFrame] = []
    outer = 0
    while n_active > 0:
        num_edges = edges.count()
        if num_edges == 0:
            # edgeless residue: every remaining vertex is a trivial SCC
            assigned_parts.append(
                verts.select("id", F.col("id").alias("scc"))
            )
            verts = None
            n_active = 0
            break
        if outer >= max_outer:
            raise RuntimeError(
                f"SCC did not finish within max_outer={max_outer} rounds "
                f"({n_active} vertices unassigned)"
            )
        big_v = n_active > 500_000
        degs_f = (
            edges.groupBy("src").agg(F.count("*").alias("deg"))
            .localCheckpoint(eager=True)
        )
        tedges = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        degs_b = (
            tedges.groupBy("src").agg(F.count("*").alias("deg"))
            .localCheckpoint(eager=True)
        )
        flab = _min_reach_fixpoint(
            edges, verts, degs_f, num_edges, n_active, big_v, max_prop
        ).withColumnRenamed("lab", "flab")
        blab = _min_reach_fixpoint(
            tedges, verts, degs_b, num_edges, n_active, big_v, max_prop
        ).withColumnRenamed("lab", "blab")
        matched = (
            flab.join(blab, "id")
            .filter(F.col("flab") == F.col("blab"))
            .select("id", F.col("flab").alias("scc"))
            .localCheckpoint(eager=True)
        )
        assigned_parts.append(matched)
        new_verts = verts.join(
            matched.select("id"), "id", "left_anti"
        ).localCheckpoint(eager=True)
        new_edges = (
            edges.join(
                new_verts.select(F.col("id").alias("src")), "src", "left_semi"
            )
            .join(
                new_verts.select(F.col("id").alias("dst")), "dst", "left_semi"
            )
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        for df in (verts, edges, degs_f, degs_b, flab, blab):
            df.unpersist()
        verts, edges = new_verts, new_edges
        n_active = verts.count()
        outer += 1
    if edges is not None:
        edges.unpersist()
    if verts is not None:
        verts.unpersist()
    if own_cache:
        graph.unpersist()
    if metrics_out is not None:
        metrics_out["outer_rounds"] = outer
    out = assigned_parts[0]
    for part in assigned_parts[1:]:
        out = out.unionByName(part)
    return out
