"""Triangle counting — degree-ordered sorted-neighbor intersection.

Reference: apps/tc.gt — relabel by decreasing degree (:30,
intrinsics.h:237-264), then for every edge with dst < src accumulate
|N(src) ∩ N(dst)| with neighbors below the cutoff (intersectNeighbor,
intrinsics.h:302-350; the 5 intersection strategies in
infra_gapbs/intersections.h collapse into one ``array_intersect`` on
sorted arrays). The verifier counts every closed triple and divides by 6
(test/verifiers/tc_verifier.cpp:13-32) — equal to our oriented count.

Spark plan (node-iterator++ on the oriented DAG):
    1. symmetrize + squish → simple undirected graph
    2. orient edges low-degree → high-degree (degree relabel makes the
       orientation "new_id asc", so every hub has small *oriented*
       out-degree — this is what kills the skew, same reason GraphIt
       relabels)
    3. adjacency blocks on the oriented DAG, sorted arrays
    4. oriented_edges ⋈ A(src) ⋈ A(dst) → Σ size(array_intersect)

Each triangle {a<b<c} (in oriented order) is counted exactly once, at its
lowest-ordered edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph


def triangle_count(graph: LinkGraph, *, relabel: bool = True) -> DataFrame:
    """Global triangle count. Returns a 1-row DataFrame (triangles: long)."""
    per_edge = _per_edge_intersections(graph, relabel)
    return per_edge.agg(
        F.coalesce(F.sum("tri"), F.lit(0)).cast("long").alias("triangles")
    )


def triangle_count_per_vertex(graph: LinkGraph, *, relabel: bool = False) -> DataFrame:
    """Per-vertex incident-triangle counts (id, tri_count) — the analogue
    of tc.gt's vertexArray, but charged to every corner of the triangle
    (each triangle increments all 3 vertices). relabel defaults False so
    ids stay in the caller's space."""
    und = graph.symmetrize()
    oriented = und.edges.filter(F.col("src") > F.col("dst"))
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    a_src = adj.select(F.col("src").alias("e_src"), F.col("nbrs").alias("nbrs_s"))
    a_dst = adj.select(F.col("src").alias("e_dst"), F.col("nbrs").alias("nbrs_d"))
    tri_nodes = (
        oriented.join(a_src, oriented["src"] == a_src["e_src"])
        .join(a_dst, oriented["dst"] == a_dst["e_dst"])
        .select(
            "src",
            "dst",
            F.explode(F.array_intersect("nbrs_s", "nbrs_d")).alias("third"),
        )
    )
    corners = (
        tri_nodes.select(F.col("src").alias("id"))
        .unionAll(tri_nodes.select(F.col("dst").alias("id")))
        .unionAll(tri_nodes.select(F.col("third").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("tri_count"))
    return (
        graph.vertices()
        .join(counts, "id", "left")
        .select("id", F.coalesce("tri_count", F.lit(0)).alias("tri_count"))
    )


def _per_edge_intersections(graph: LinkGraph, relabel: bool) -> DataFrame:
    und = graph.symmetrize()
    if relabel:
        und = und.relabel_by_degree()
    # Orient low-degree -> high-degree. After degree-desc relabel, larger
    # new_id == smaller degree, so src > dst points each edge away from
    # its lower-degree endpoint and forward-degree is O(sqrt(E))-bounded
    # (arboricity argument) — the hub's huge neighbor list is never the
    # src side of the intersection join.
    oriented = und.edges.filter(F.col("src") > F.col("dst"))
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    a_src = adj.select(F.col("src").alias("e_src"), F.col("nbrs").alias("nbrs_s"))
    a_dst = adj.select(F.col("src").alias("e_dst"), F.col("nbrs").alias("nbrs_d"))
    return (
        oriented.join(a_src, oriented["src"] == a_src["e_src"])
        .join(a_dst, oriented["dst"] == a_dst["e_dst"])
        .select(
            "src",
            "dst",
            F.size(F.array_intersect("nbrs_s", "nbrs_d")).alias("tri"),
        )
    )
