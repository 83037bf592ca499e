"""k-truss decomposition — triangle-support edge peeling.

The edge-level analogue of k-core (kernels/kcore.py, reference
apps/kcore.gt Julienne buckets): the k-truss is the maximal subgraph
in which every edge participates in at least k-2 triangles. Denser and
more noise-robust than k-core for community detection on link graphs.
Not in the reference's app set; built from the same two §2 primitives
its TC and k-core kernels use — sorted-adjacency `intersectNeighbor`
(apps/tc.gt) and iterated peel-until-stable (apps/kcore.gt).

Per round, on the surviving undirected subgraph:
  1. orient every edge from its lower (degree, id) endpoint — the
     arboricity bound from triangles.py: the hub's full neighbor list
     is never the intersected side, forward degree is O(sqrt(E));
  2. enumerate triangles once via sorted-array `array_intersect` +
     explode (each triangle exactly once on the oriented DAG);
  3. every triangle credits its three undirected edges; support =
     per-edge credit count (map-side combined);
  4. drop edges with support < k-2.
Repeat until no edge drops. Peeling is monotone (supports only
decrease as edges leave), so the fixpoint is the standard unique
k-truss. One count action per round; each round's survivor set is
checkpointed and the superseded one released, so later rounds rescan
only the residual subgraph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph


def k_truss(
    graph: LinkGraph,
    k: int = 4,
    *,
    max_rounds: int = 24,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Returns (src, dst, support) for the edges of the k-truss of the
    symmetrized simple graph, src < dst, support = triangles per edge
    within the truss (all >= k-2). Raises if the peel has not reached
    its fixpoint within max_rounds."""
    own_cache = graph.ensure_persisted()
    sym = graph.symmetrize()
    und = (
        sym.edges.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint(eager=True)
    )
    n_edges = und.count()
    rounds = 0
    support = None
    while True:
        both = und.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
            und.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        deg = both.groupBy("a").agg(F.count("*").alias("d"))
        du = deg.select(F.col("a").alias("u"), F.col("d").alias("du"))
        dv = deg.select(F.col("a").alias("v"), F.col("d").alias("dv"))
        keyed = und.join(du, "u").join(dv, "v")
        fwd = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        oriented = keyed.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        adj = oriented.groupBy("s").agg(
            F.sort_array(F.collect_list("t")).alias("nbrs")
        )
        a_s = adj.select(F.col("s").alias("es"), F.col("nbrs").alias("nbrs_s"))
        a_t = adj.select(F.col("s").alias("et"), F.col("nbrs").alias("nbrs_t"))
        tris = (
            oriented.join(a_s, oriented["s"] == a_s["es"])
            .join(a_t, oriented["t"] == a_t["et"])
            .select(
                "s",
                "t",
                F.explode(F.array_intersect("nbrs_s", "nbrs_t")).alias("w"),
            )
        )
        # each triangle (s, t, w) credits its three undirected edges
        tri_edges = None
        for x, y in (("s", "t"), ("s", "w"), ("t", "w")):
            part = tris.select(
                F.least(F.col(x), F.col(y)).alias("u"),
                F.greatest(F.col(x), F.col(y)).alias("v"),
            )
            tri_edges = part if tri_edges is None else tri_edges.unionAll(part)
        sup = tri_edges.groupBy("u", "v").agg(F.count("*").alias("support"))
        scored = (
            und.join(sup, ["u", "v"], "left")
            .select(
                "u",
                "v",
                F.coalesce("support", F.lit(0)).alias("support"),
            )
            .localCheckpoint(eager=True)
        )
        keep = scored.filter(F.col("support") >= k - 2)
        n_keep = keep.count()
        rounds += 1
        if n_keep == n_edges:
            support = scored
            und.unpersist()
            break
        if rounds >= max_rounds:
            scored.unpersist()
            und.unpersist()
            raise RuntimeError(
                f"k_truss did not converge within max_rounds={max_rounds}"
            )
        new_und = keep.select("u", "v").localCheckpoint(eager=True)
        und.unpersist()
        scored.unpersist()
        und = new_und
        n_edges = n_keep
    if own_cache:
        graph.unpersist()
    if metrics_out is not None:
        metrics_out["rounds"] = rounds
    return support.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "support"
    )
