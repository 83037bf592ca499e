"""Spectral bisection — Fiedler-vector approximation by deflated power
iteration on the graph Laplacian.

Reference provenance: GraphIt's eigenvector kernel
(test/input/eigenvector_centrality.gt) is a plain power iteration; the
Fiedler vector needs the same edge-gather recurrence applied to
M = cI - L (L = D - A on the symmetrized graph, c >= lambda_max(L) so M
is PSD) plus a per-round deflation against L's trivial null vector
(the all-ones vector) — i.e. subtract the mean each round. The sign of
the converged vector bisects the graph (Fiedler 1973), the classic
seed for graph partitioning — the same partitioning question this
engine answers for 100 TB edge tables.

Scale shape: per round one edge gather (join + map-side-combined
groupBy(dst) sum — identical to the PageRank superstep), one COMBINED
scalar aggregate (sum, sum of squares, count in a single action; the
mean-centering and normalization reuse it via
norm = sqrt(s2 - s1^2/n)), then a V-sized projection with the two
driver scalars folded in as literals. localCheckpoint per round keeps
lineage flat. No sort, no Window, no O(V) collect.

Determinism/parity: init is integer hash arithmetic
((id*2654435761) mod 2048)/2048 - 0.5, c = 2*max_degree (exact
integers), and every float expression is written identically in the
DuckDB twin — the only nondeterminism is float summation order, which
the ROUND_RANK rounding absorbs (same argument as the eigenvector /
collaborative-filtering twins).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph
from graphit_spark.plans.state import fresh_checkpoint

SPECTRAL_ROUNDS = 8
_INIT_MULT = 2654435761  # Knuth multiplicative hash constant
_INIT_MOD = 2048


def spectral_bisection(
    graph: LinkGraph, *, rounds: int = SPECTRAL_ROUNDS
) -> DataFrame:
    """Returns (id, fiedler, side): the approximate Fiedler vector after
    ``rounds`` deflated power iterations on c·I − L, and the bisection
    side (1 iff the rounded coordinate is positive)."""
    und = graph.symmetrize()
    own_cache = und.ensure_persisted()

    deg = und.edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("d")
    )
    base = (
        und.vertices()
        .join(deg, "id", "left")
        .select("id", F.coalesce("d", F.lit(0)).cast("long").alias("d"))
        .transform(fresh_checkpoint)
    )
    c = 2 * int(base.agg(F.max("d")).collect()[0][0] or 0)

    state = base.select(
        "id",
        "d",
        (
            ((F.col("id") * F.lit(_INIT_MULT)) % F.lit(_INIT_MOD)).cast(
                "double"
            )
            / F.lit(float(_INIT_MOD))
            - F.lit(0.5)
        ).alias("x"),
    ).transform(fresh_checkpoint)
    base.unpersist()

    prev = state
    for _ in range(rounds):
        gathered = (
            und.edges.join(
                state.select(F.col("id").alias("src"), "x"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("s"))
        )
        y = state.join(gathered, "id", "left").select(
            "id",
            "d",
            (
                (F.lit(float(c)) - F.col("d")) * F.col("x")
                + F.coalesce("s", F.lit(0.0))
            ).alias("y"),
        )
        stats = y.agg(
            F.sum("y").alias("s1"),
            F.sum(F.col("y") * F.col("y")).alias("s2"),
            F.count("*").alias("n"),
        ).collect()[0]
        s1, s2, n = float(stats["s1"]), float(stats["s2"]), int(stats["n"])
        m = s1 / n
        # Centered variance can come out a hair negative in floats when
        # every y is (near-)identical; both engines guard var <= 0 -> 1
        # identically (the SQL twin's CASE mirrors this line for line).
        var = s2 - s1 * s1 / n
        norm = math.sqrt(var) if var > 0 else 1.0
        state = y.select(
            "id",
            "d",
            ((F.col("y") - F.lit(m)) / F.lit(norm)).alias("x"),
        ).transform(fresh_checkpoint)
        prev.unpersist()
        prev = state

    out = state.select(
        "id",
        (F.round(F.col("x"), 6) + F.lit(0.0)).alias("fiedler"),
        F.when(F.round(F.col("x"), 6) > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("side"),
    )
    out = out.transform(fresh_checkpoint)
    state.unpersist()
    if own_cache:
        und.unpersist()
    return out
