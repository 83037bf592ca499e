"""Redirect-chain resolution — pointer doubling over a functional graph.

A crawl's redirect table (HTTP 3xx, rel=canonical, URL aliases) is a
functional graph: each source url has at most one outgoing pointer.
Resolving every url to its terminal target is the same path-shortcut
primitive the reference's connected-components kernel uses for its
pointer-jumping phase (apps/cc_lp_pj.gt; kernels/components.py here) —
but run to FULL resolution, with hop counts, and with cycle detection
(redirect loops are real on the web and must not hang the job).

Spark plan per doubling round: one self-equi-join of the pointer table
on (ptr = src) — the classic f <- f∘f halving, so a chain of length L
resolves in ceil(log2 L) rounds — followed by one scalar count action
for the convergence test. State is localCheckpointed each round and the
superseded snapshot released, same discipline as pagerank. No driver-
side iteration over rows; cycles are detected distributively (a row
whose accumulated hop count exceeds the table size can only be looping)
rather than by driver walks.

At 100 TB: the table shuffles on hashed url ids only (never strings —
callers map urls through the engine's url dictionary first), each round
is one hash join of two same-keyed tables, and rounds are logarithmic
in the longest chain (real redirect chains are < 32 hops, so ~5 rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.plans.state import fresh_checkpoint


def resolve_redirects(
    redirects: DataFrame,
    *,
    max_rounds: int = 64,
) -> DataFrame:
    """Resolve each redirect source to its terminal target.

    `redirects`: (src, dst) — at most one row per src; if duplicates
    exist the minimum dst wins (deterministic tie rule, same contract
    as the engine's min-label reductions).

    Returns (src, target, hops, cycle):
      - terminal rows: target = the first node reached that is not
        itself a redirect source, hops = exact chain length,
        cycle = false;
      - rows trapped in a redirect loop: target/hops NULL, cycle = true.
    """
    r = (
        redirects.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    n = r.count()  # also materializes the deduped map
    state = r.select(
        "src",
        F.col("dst").alias("ptr"),
        F.lit(1).cast("long").alias("hops"),
    ).transform(fresh_checkpoint)
    for _ in range(max_rounds):
        jump = state.select(
            F.col("src").alias("j_src"),
            F.col("ptr").alias("j_ptr"),
            F.col("hops").alias("j_hops"),
        )
        new = (
            state.join(jump, state["ptr"] == jump["j_src"], "left")
            .select(
                "src",
                F.coalesce("j_ptr", "ptr").alias("ptr"),
                (F.col("hops") + F.coalesce("j_hops", F.lit(0))).alias(
                    "hops"
                ),
            )
            .transform(fresh_checkpoint)
        )
        # unresolved = rows still pointing INTO the redirect domain that
        # cannot yet be written off as loops (hops bound: any genuine
        # chain has at most n hops)
        unresolved = (
            new.join(
                new.select(F.col("src").alias("ptr")).distinct(), "ptr"
            )
            .filter(F.col("hops") <= n)
            .count()
        )
        state.unpersist()
        state = new
        if unresolved == 0:
            break
    dom = (
        state.select(F.col("src").alias("ptr"))
        .distinct()
        .withColumn("in_dom", F.lit(True))
    )
    out = state.join(dom, "ptr", "left")
    is_cycle = F.coalesce("in_dom", F.lit(False))
    resolved = out.select(
        "src",
        F.when(is_cycle, F.lit(None)).otherwise(F.col("ptr")).alias(
            "target"
        ),
        F.when(is_cycle, F.lit(None)).otherwise(F.col("hops")).alias(
            "hops"
        ),
        is_cycle.alias("cycle"),
    )
    final = resolved.transform(fresh_checkpoint)
    state.unpersist()
    return final
