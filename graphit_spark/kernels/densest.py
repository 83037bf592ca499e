"""Densest subgraph by parallel greedy peeling.

The densest-subgraph problem (maximize |E(S)| / |S| over vertex subsets
S of the undirected graph) is the classic "find the core community /
spam farm" primitive on web link graphs. Charikar's greedy (remove the
minimum-degree vertex, keep the best prefix) is a 2-approximation but
inherently serial; the MapReduce variant (Bahmani, Kumar, Vassilvitskii,
VLDB 2012 — public literature) peels EVERY vertex whose degree is at
most 2(1+eps) times the current density per round, giving a
2(1+eps)-approximation in O(log_{1+eps} n) rounds — the same
synchronous-peel shape as kernels/kcore.py.

Reference provenance: no GraphIt app covers this; semantically it is
the §2.3 `applyUpdatePriority` bucket pattern (like apps/k_core.gt)
with a global, density-dependent bucket threshold instead of a fixed k.

Scale shape: each round is one degree aggregation over the induced
subgraph (map-side combined) plus a semi-join — no collect, no
driver-side vertex loop. The threshold test is integer-exact
(``deg * n <= 3 * m`` for eps = 1/2, i.e. deg <= 3·density), so the
peel sequence is bit-reproducible and SQL-twinnable. Every round
removes more than 1/3 of the surviving vertices (sum of degrees = 2m,
so survivors with deg > 3m/n number < 2n/3), bounding rounds at
log_{1.5} n — 19 rounds covers n = 1500, ~47 covers n = 10^12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph
from graphit_spark.plans.state import fresh_checkpoint


def densest_subgraph(
    graph: LinkGraph, *, max_rounds: int = 20
) -> DataFrame:
    """Best-density peel prefix of the symmetrized graph.

    Returns (id, best_round, density): the vertices of the densest
    subgraph seen across the peel (density = undirected edges /
    vertices, ties broken toward the earliest round), with the round
    index and the 6-dp-rounded density on every row.
    """
    g = graph.symmetrize()
    own_cache = g.ensure_persisted()

    keep = graph.vertices().transform(fresh_checkpoint)
    n = keep.count()
    rounds: list[tuple[int, int, int, DataFrame]] = []  # (r, n, m, keep)

    for r in range(max_rounds + 1):
        alive = g.edges.join(
            keep.select(F.col("id").alias("src")), "src", "left_semi"
        ).join(keep.select(F.col("id").alias("dst")), "dst", "left_semi")
        m = alive.count() // 2  # sym holds both directions
        if n == 0:
            keep.unpersist()  # empty tail checkpoint, never recorded
            break
        rounds.append((r, n, m, keep))
        if r == max_rounds or m == 0:
            break
        deg = alive.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("d")
        )
        new_keep = (
            keep.join(deg, "id", "left")
            # integer-exact peel: survive iff deg > 3 * density
            .filter(F.coalesce("d", F.lit(0)) * F.lit(n) > F.lit(3 * m))
            .select("id")
            .transform(fresh_checkpoint)
        )
        n = new_keep.count()
        keep = new_keep

    if not rounds:  # vertexless graph: nothing to peel
        if own_cache:
            g.unpersist()
        return graph.spark.createDataFrame(
            [], "id long, best_round long, density double"
        )
    # densest round: compare m/n as exact fractions (no float), ties to
    # the earliest round — a pure driver scalar pass over <= max_rounds
    # tuples, never data-sized
    best_r, best_n, best_m, best_df = rounds[0]
    for r, nn, mm, df in rounds[1:]:
        if mm * best_n > best_m * nn:
            best_r, best_n, best_m, best_df = r, nn, mm, df
    out = best_df.select(
        "id",
        F.lit(best_r).cast("long").alias("best_round"),
        F.round(
            F.lit(float(best_m)) / F.lit(float(best_n)), 6
        ).alias("density"),
    )
    for r, _nn, _mm, df in rounds:
        if df is not best_df:
            df.unpersist()
    # best_df's checkpoint stays alive — `out` reads from it lazily
    if own_cache:
        g.unpersist()
    return out
