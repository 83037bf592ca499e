"""Co-citation pair counting: pages frequently cited TOGETHER.

Co-citation strength (Small 1973, public bibliometrics literature) of a
page pair (a, b) is the number of distinct pages whose out-links
include both — the classic "related pages" signal on a web link graph
(bibliographic coupling is the same computation on the transpose).

Reference provenance: no GraphIt intrinsic; semantically it is one
`edges.apply` gather whose per-source body enumerates neighbor pairs —
the same §2.5 adjacency patterns as triangle counting
(kernels/triangles.py) minus the closing-edge check.

Scale shape: one groupBy(src) builds the sorted out-neighbor set, a
pure Column expression (nested transform over the array, no self-join,
no UDF) explodes the C(d,2) pairs, then one map-side-combined
groupBy(a, b). The quadratic hub blowup is capped the same way LSH
banding caps bucket fan-out: sources with out-degree > max_degree are
excluded BEFORE the explode (a documented, deterministic cut — hub
pages like portals co-cite everything and carry no signal; the cap is
the standard bibliometrics practice). Cost is Σ min(d, cap)² over
sources, never corpus-quadratic; every shuffle keys on pair/vertex
cardinalities. Final top-k compiles to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph

COCITE_MAX_DEGREE = 64
COCITE_MIN_COUNT = 2
COCITE_TOP_K = 100


def cocitation(
    graph: LinkGraph,
    *,
    max_degree: int = COCITE_MAX_DEGREE,
    min_count: int = COCITE_MIN_COUNT,
    k: int = COCITE_TOP_K,
) -> DataFrame:
    """Top-k page pairs (page_a < page_b) by co-citation count: the
    number of distinct sources citing both, over sources with
    2 <= out_degree <= max_degree. Deterministic total order
    (n_common DESC, page_a, page_b)."""
    if max_degree < 2:
        raise ValueError("max_degree must be >= 2")
    adj = (
        graph.edges.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .filter(
            (F.size("nbrs") >= 2) & (F.size("nbrs") <= max_degree)
        )
    )
    n = F.size(F.col("nbrs"))
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("nbrs"), i).alias("a"),
                    F.element_at(F.col("nbrs"), j).alias("b"),
                ),
            ),
        )
    )
    pairs = adj.select(F.explode(pair_structs).alias("p")).select(
        F.col("p.a").alias("page_a"), F.col("p.b").alias("page_b")
    )
    counts = (
        pairs.groupBy("page_a", "page_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_count)
    )
    return counts.orderBy(
        F.desc("n_common"), F.asc("page_a"), F.asc("page_b")
    ).limit(k)


def butterfly_count(
    graph: LinkGraph, *, max_degree: int | None = None
) -> DataFrame:
    """Butterfly (bipartite 4-cycle) census over the directed edge set:
    one row (wedges, cocited_pairs, butterflies) where a wedge is an
    ordered source citing a dst pair (a < b), cocited_pairs counts the
    distinct dst pairs with at least one co-citing source, and a
    butterfly is two distinct sources citing the same dst pair — the
    standard bipartite cohesion census (Sanei-Mehri et al., KDD 2018,
    public literature) read on the src→dst link relation.

    butterflies = sum over dst pairs of C(c, 2) for c co-citing
    sources — all-integer arithmetic, bit-exact.

    Scale shape: identical to cocitation() — per-source sorted-array
    pair expansion (no self-join), map-side-combined pair groupBy, one
    scalar aggregate. Cost is sum of out_degree^2 over sources;
    ``max_degree`` (None = exact) is the documented estimator knob for
    graphs whose out-degrees are not structurally bounded — portal-like
    hub sources are cut BEFORE the explode, the same cap discipline as
    cocitation and LSH banding.
    """
    adj = graph.edges.groupBy("src").agg(
        F.sort_array(F.collect_set("dst")).alias("nbrs")
    )
    if max_degree is not None:
        adj = adj.filter(F.size("nbrs") <= max_degree)
    adj = adj.filter(F.size("nbrs") >= 2)
    n = F.size(F.col("nbrs"))
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("nbrs"), i).alias("a"),
                    F.element_at(F.col("nbrs"), j).alias("b"),
                ),
            ),
        )
    )
    cnt = (
        adj.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("c"))
    )
    return cnt.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("wedges"),
        F.count("*").cast("long").alias("cocited_pairs"),
        F.coalesce(F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0))
        .cast("long")
        .alias("butterflies"),
    )
