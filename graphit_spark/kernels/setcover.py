"""Parallel (1+eps)-approximate greedy set cover — GraphIt's
`set_cover.gt` priority-bucket application mapped to Spark supersteps.

Reference: apps/set_cover.gt (log-bucketed degrees via
`priority_queue{Vertex}` + `applyUpdatePriorityExtern`) whose extern body
is test/input_with_schedules/set_cover_extern.cpp:25-75 (Julienne's
MaxCover): sets = vertices, elements = out-neighbors. Each round
dequeues the highest-degree bucket; member sets with residual degree
>= (1+eps)^p compete for their uncovered elements via writeMin(set id);
a set that wins >= max(ceil((1+eps)^(p-1)), 1) elements joins the cover
and marks its won elements covered; everything else is re-bucketed by
residual degree. This yields the standard (1+eps)-factor-of-greedy
approximation while exposing bucket-level parallelism.

Spark realization (SURVEY §2.3 `applyUpdatePriority` row): no
distributed PQ — the current priority is a driver scalar; "dequeue the
top bucket" is a filter on residual degree, the writeMin competition is
`groupBy(element).agg(min(set))`, and win-counting is one more groupBy.
All shuffles key on element id or set id (the same gather-scatter shape
as PageRank), so hub elements are absorbed by map-side partial
aggregation. Deterministic: min-set-id wins every race, so results are
reproducible across cluster sizes (the reference's CAS races are not).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph
from graphit_spark.plans.state import fresh_checkpoint

EPSILON = 0.01


def set_cover(
    graph: LinkGraph,
    *,
    epsilon: float = EPSILON,
    max_rounds: int = 10_000,
) -> DataFrame:
    """Greedy-bucketed set cover: sets are src vertices, the universe is
    every vertex that appears as a dst. Returns (set_id, round) — the
    chosen cover, with the superstep that admitted each set.
    """
    x = 1.0 / math.log1p(epsilon)

    # sets -> elements (out-adjacency after squish, like the reference's
    # packed CSR); persists for the whole run
    elems = graph.edges.select(
        F.col("src").alias("s"), F.col("dst").alias("e")
    ).persist()
    spark = elems.sparkSession

    covered = spark.createDataFrame([], "e long").transform(fresh_checkpoint)
    prev_cov = covered  # superseded checkpoints released per round
    cover_parts: list[DataFrame] = []
    bucket_of = F.floor(F.lit(x) * F.log(F.col("rdeg").cast("double")))

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        live = elems.join(covered, "e", "left_anti")
        rdeg = live.groupBy("s").agg(F.count("*").alias("rdeg"))
        top = rdeg.agg(F.max(bucket_of).alias("p")).collect()[0]["p"]
        if top is None:
            break  # pq.finished(): every set's residual degree is 0
        p = int(top)
        threshold = math.ceil((1.0 + epsilon) ** p)
        low = max(math.ceil((1.0 + epsilon) ** (p - 1)), 1)

        active = rdeg.filter(F.col("rdeg") >= threshold).select("s")
        # writeMin competition: min set id acquires each uncovered element
        contested = live.join(active, "s")
        winners = (
            contested.groupBy("e").agg(F.min("s").alias("s"))
        )
        wins = winners.groupBy("s").agg(F.count("*").alias("won"))
        admitted = wins.filter(F.col("won") >= low).select("s")
        admitted = admitted.transform(fresh_checkpoint)
        n_admitted = admitted.count()
        if n_admitted > 0:
            cover_parts.append(
                admitted.select("s", F.lit(rounds).alias("round"))
            )
            newly = winners.join(admitted, "s").select("e")
            covered = covered.union(newly).transform(fresh_checkpoint)
            prev_cov.unpersist()
            prev_cov = covered
        else:
            # unreachable given integer degrees: p = floor(x*ln(rdeg))
            # implies ceil((1+eps)^p) <= max rdeg, so the top bucket is
            # never empty, and the globally-smallest active set id wins
            # ALL of its own >= threshold >= low elements. Defensive
            # break so a float-boundary surprise cannot livelock.
            break
    out_schema = "set_id long, round int"
    if not cover_parts:
        return spark.createDataFrame([], out_schema)
    out = cover_parts[0]
    for part in cover_parts[1:]:
        out = out.union(part)
    return out.select(F.col("s").alias("set_id"), "round")
