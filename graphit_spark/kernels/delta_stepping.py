"""SSSP by delta-stepping — GraphIt's ordered-processing operator mapped
to driver-side priority buckets.

Reference: apps/sssp_delta_stepping.gt — a lazy bucket priority queue
(`pq.updatePriorityMin`, runtime infra_julienne/bucket.h; lowering
src/midend/priority_features_lowering.cpp:242-265). Each outer round
dequeues the lowest non-empty bucket as the frontier
(`pq.dequeue_ready_set`) and relaxes its out-edges
(`edges.from(frontier).applyUpdatePriority(updateEdge)`), re-inserting
improved vertices into their new buckets, until the queue is exhausted.

Spark realization (SURVEY §2.3 row `applyUpdatePriority`): there is no
distributed priority queue — the bucket structure lives in the driver as
a scalar `current bucket index`; membership is a `filter` on the distance
column (`dist div delta == k`). Inner loop: relax edges out of the
current bucket until it stops changing (light-edge re-relaxation);
then advance k to the next non-empty bucket (one small `agg(min)` job).
The fixpoint equals Bellman-Ford's exact distances — the ordered
schedule only changes *work order*, which is the reference's claim too
(CGO 2020). Every relaxation round is the same partition-pruned
join + groupBy(min) superstep as kernels/paths.py, so scale behavior is
identical; the win is touching each edge O(1) expected times instead of
O(rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph
from graphit_spark.plans.state import fresh_checkpoint


def sssp_delta_stepping(
    graph: LinkGraph,
    source: int = 0,
    *,
    delta: int = 4,
    max_rounds: int = 10_000,
    store=None,
    resume: bool = False,
) -> DataFrame:
    """(id, dist) exact shortest paths; NULL = unreachable.

    delta: bucket width in weight units (reference default set per-graph
    by schedule; weights here are small ints so a few weight-units wide
    is a good default).

    store/resume: the north-rule checkpoint contract extended to the
    Julienne priority-bucket layer — each relaxation round snapshots
    (id, dist) with the NEXT scalar bucket cursor in its manifest
    metrics, so a killed run restarts inside the correct bucket.
    Distances are integers and the relaxation is a min-fixpoint, so the
    resumed run is byte-identical to an uninterrupted one (same
    argument as BFS/SSSP; bucket-advance scans between snapshots are
    idempotent and simply replay)."""
    if not graph.weighted:
        raise ValueError("delta-stepping requires a weighted graph")
    import time as _time

    own_cache = graph.ensure_persisted()

    bucket = 0
    rounds = 0
    if resume and store is not None and store.latest() is not None:
        it = store.latest()
        dist = (
            store.read(graph.spark, it)
            .select("id", "dist")
            .transform(fresh_checkpoint)
        )
        meta = store.manifest(it).get("metrics") or {}
        bucket = int(meta.get("bucket", 0))
        rounds = it + 1
    else:
        dist = graph.vertices().select(
            "id",
            F.when(F.col("id") == source, F.lit(0).cast("long")).alias(
                "dist"
            ),
        ).transform(fresh_checkpoint)

    while rounds < max_rounds:
        # frontier = current bucket's members (dequeue_ready_set)
        frontier = dist.filter(
            F.col("dist").isNotNull()
            & (F.floor(F.col("dist") / delta) == bucket)
        ).select(F.col("id").alias("src"), F.col("dist").alias("sdist"))
        if frontier.limit(1).count() == 0:
            nxt = (
                dist.filter(
                    F.col("dist").isNotNull()
                    & (F.floor(F.col("dist") / delta) > bucket)
                )
                .agg(F.min(F.floor(F.col("dist") / delta)).alias("b"))
                .collect()[0]["b"]
            )
            if nxt is None:
                break  # pq.finished()
            bucket = int(nxt)
            continue
        rounds += 1
        t0 = _time.time()
        cand = (
            graph.edges.join(frontier, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("sdist") + F.col("weight")).alias("cand"),
            )
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        new_dist = (
            dist.join(cand, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("cand").isNotNull()
                    & (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))),
                    F.col("cand"),
                )
                .otherwise(F.col("dist"))
                .alias("dist"),
                F.col("dist").alias("old"),
            )
            .transform(fresh_checkpoint)
        )
        # did this round improve anything still landing in the current
        # bucket? (light edges -> re-relax; otherwise bucket is settled)
        improved_in_bucket = (
            new_dist.filter(
                (F.col("old").isNull() | (F.col("dist") < F.col("old")))
                & (F.floor(F.col("dist") / delta) == bucket)
            )
            .limit(1)
            .count()
        )
        prev = dist
        dist = new_dist.select("id", "dist")
        prev.unpersist()
        if improved_in_bucket == 0:
            bucket += 1
        if store is not None:
            store.write(
                dist,
                rounds - 1,
                {
                    "kernel": "sssp_delta_stepping",
                    "bucket": bucket,
                    "elapsed_sec": _time.time() - t0,
                },
            )
    if own_cache:
        graph.unpersist()
    return dist
