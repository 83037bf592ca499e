"""The gather-scatter traversal core.

GraphIt's central operator family is ``edges.from(F).to(p).applyModified(f)``
— generated per call site by the backend (reference
src/backend/gen_edge_apply_func_decl.cpp). Here it is ONE declarative plan:

    messages = edges ⋈ vertex_state ON src      (property lookup by src)
    gathered = messages.groupBy(dst).agg(...)   (the reduction — shuffle
                                                 aggregation replaces
                                                 GraphIt's atomics,
                                                 atomics_op_lower.cpp)

Direction (push vs pull vs hybrid, apply_expr_lower.cpp:39-148) dissolves
into Spark join-strategy choice; what remains meaningful at scale is the
*frontier representation* decision (sparse broadcast semi-join vs dense
full-edge scan), which we make per superstep with Ligra's threshold:
switch to the dense plan when ``frontier_size + frontier_out_degree_sum >
num_edges / 20`` (reference gen_edge_apply_func_decl.cpp:722,888).

Skew: map-side partial aggregation already collapses hub destinations to
≤ num_partitions partial rows — MEASURED equivalent to explicit salting
on a 10M-edge graph (bench.py BENCH_SKEW_EDGES default) with a
30%-of-all-edges hub (plain 0.87s vs salted
0.81s best-of-3, within host noise; bench.py records a `skew_gather`
row per round). ``gather_scatter(salt=k)`` therefore stays OFF by
default and exists for the regimes partial aggregation cannot cover:
non-decomposed custom aggregates, or RDD-style paths outside Catalyst —
mirroring GraphIt's edge-aware load balancing
(gen_edge_apply_func_decl.cpp:619-690) as an explicit schedule choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ligra/Beamer direction-switch denominator (gen_edge_apply_func_decl.cpp:722)
DIRECTION_THRESHOLD_FRACTION = 20


def choose_direction(
    frontier_size: int,
    frontier_out_degree_sum: int,
    num_edges: int,
    threshold_fraction: int = DIRECTION_THRESHOLD_FRACTION,
) -> str:
    """'sparse' (broadcast frontier semi-join, push-like) or 'dense'
    (full edge scan, pull-like). Default threshold matches the reference;
    ``threshold_fraction`` is the tunable denominator — GraphIt exposes
    it through the autotuner's schedule space (autotune/
    graphit_autotuner.py), here through graphit_spark.tune."""
    if frontier_size + frontier_out_degree_sum > num_edges / threshold_fraction:
        return "dense"
    return "sparse"


def gather_scatter(
    edges: DataFrame,
    vertex_state: DataFrame,
    message: Column,
    agg: Column,
    *,
    frontier: DataFrame | None = None,
    direction: str = "auto",
    num_edges: int | None = None,
    frontier_size: int | None = None,
    frontier_degree_sum: int | None = None,
    salt: int | None = None,
) -> DataFrame:
    """One superstep: for each (active) edge, send ``message`` (an
    expression over the src vertex's state columns and edge columns) to
    ``dst`` and reduce with ``agg``. Returns (id, gathered).

    vertex_state must have an ``id`` column; its other columns are
    available to ``message`` (e.g. ``F.col("rank") / F.col("out_degree")``).
    frontier, if given, is a DataFrame of active source ids (GraphIt
    ``edges.from(frontier)``, fir.h:1770).

    salt: explicit two-level aggregation (groupBy(id, salt) partials →
    groupBy(id) finish) for hub destinations. Only valid when ``agg`` is
    associative-commutative AND idempotent-composable (sum/min/max —
    the same expression re-aggregates the partials). Spark's map-side
    partial aggregation makes this redundant for the built-in plans
    (measured — see module docstring); use it for custom aggregates
    that Catalyst cannot partially aggregate.
    """
    state = vertex_state.withColumnRenamed("id", "__src_id")
    if frontier is not None:
        if direction == "auto":
            if None in (num_edges, frontier_size, frontier_degree_sum):
                direction = "dense"
            else:
                direction = choose_direction(
                    frontier_size, frontier_degree_sum, num_edges
                )
        active = frontier.select(F.col(frontier.columns[0]).alias("__src_id"))
        if direction == "sparse":
            # push-like: broadcast the small frontier, semi-join prunes the
            # edge scan before the big join.
            edges = edges.join(
                F.broadcast(active), edges["src"] == active["__src_id"], "left_semi"
            )
        elif direction in ("dense", "dense_forward", "dense_pull"):
            # GraphIt distinguishes DensePush (forward: scan edges, test
            # the src's frontier bool) from DensePull (gather at dst,
            # test src) — gen_edge_apply_func_decl.cpp:722,888. Under a
            # join+groupBy plan BOTH collapse to the same physical shape:
            # one full E-scan with the frontier restriction carried on
            # the V-sized state side; only the sparse/dense choice
            # remains meaningful, so the aliases are accepted and
            # documented as equivalent (asserted in test_traversal).
            state = state.join(active, "__src_id", "left_semi")
        else:
            raise ValueError(f"unknown direction: {direction}")
    msgs = edges.join(state, edges["src"] == state["__src_id"]).select(
        F.col("dst").alias("id"), message.alias("__msg")
    )
    if salt:
        partial = msgs.withColumn(
            "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
        ).groupBy("id", "__salt").agg(agg.alias("__msg"))
        return partial.groupBy("id").agg(agg.alias("gathered"))
    return msgs.groupBy("id").agg(agg.alias("gathered"))


def salted_sum(
    df: DataFrame, key: str, value: str, num_salts: int = 32
) -> DataFrame:
    """Two-level sum aggregation with explicit key salting for hub skew:
    groupBy(key, salt) partial-sums, then groupBy(key) finishes. Returns
    (key, sum_value)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(num_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias(f"sum_{value}"))


def track_changes(
    old_state: DataFrame, new_state: DataFrame, column: str
) -> DataFrame:
    """GraphIt change-tracking (src/midend/change_tracking_lower.cpp:38-75):
    the next frontier = vertices whose ``column`` differs between old and
    new state. Both inputs keyed by ``id``. Dedup is inherent (one row per
    id), matching the reference's CAS-dedup flag (mir.h:972)."""
    o = old_state.select("id", F.col(column).alias("__old"))
    n = new_state.select("id", F.col(column).alias("__new"))
    # null-safe inequality: NULL = "unvisited" in distance-style states,
    # and a NULL -> value transition IS a modification
    return (
        n.join(o, "id")
        .filter(~F.col("__new").eqNullSafe(F.col("__old")))
        .select("id")
    )
