"""Bridge (cut-edge) detection — 2-edge-connectivity at cluster scale.

A bridge is an edge whose removal disconnects its endpoints. The
sequential textbook algorithm is a DFS (Tarjan low-links) — inherently
serial, exactly what a distributed engine cannot run. The scalable
formulation here is BFS-tree + cut-coverage hashing (the
Ahn-Guha-McGregor linear-sketch idea specialized to a static graph):

1. Components by synchronous min-label propagation; each component's
   root is its minimum id. (O(diameter) rounds — every round the same
   gather superstep as CC.)
2. Multi-source BFS from the roots gives depth(v); the BFS TREE is the
   spanning tree: parent(v) = min neighbor at depth(v)-1 (unique by
   total order, depth bounded by eccentricity — BFS trees are shallow
   where an arbitrary spanning tree need not be).
3. Every NON-tree edge {a, b} gets a deterministic 60-bit md5 hash,
   XORed into both endpoints: h(v).
4. Bottom-up over depth levels, fold S(v) = XOR of h over v's subtree
   into its parent. A non-tree edge contributes to S(v) iff EXACTLY
   ONE endpoint lies in subtree(v) — iff it crosses the cut that
   removing tree edge (parent(v), v) would open; edges inside the
   subtree cancel (x ⊕ x = 0).
5. Tree edge (parent(v), v) is a bridge iff S(v) == 0; non-tree edges
   are never bridges (they close a cycle through the tree).

S(v) == 0 with a surviving crossing edge needs an exact XOR collision
of distinct 60-bit md5 values (~2^-60 per tree edge, and deterministic
— the DuckDB twin replays identical hashes, so cross-engine parity
holds unconditionally). The pytest oracle brute-forces per-edge
connectivity to pin semantics.

Scale shape: three bounded loops of the standard frontier ⋈ edges
gather (labels, depths, level folds), one grouped bit_xor, every
shuffle keyed on a vertex id. All round counts are O(graph diameter);
the kernel RAISES when a cap is hit rather than return silently wrong
bridges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphit_spark.graph import LinkGraph
from graphit_spark.plans.state import fresh_checkpoint


def _hash60(u, v) -> F.Column:
    """Deterministic 60-bit edge hash: first 15 md5 hex digits of
    "u_v_bridge" — SQL-reproducible, fits BIGINT."""
    s = F.concat_ws(
        "_", u.cast("string"), v.cast("string"), F.lit("bridge")
    )
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def bridges(graph: LinkGraph, *, max_rounds: int = 24) -> DataFrame:
    """(u, v) with u < v — the bridge edges of the symmetrized simple
    graph. max_rounds bounds each phase (label propagation, BFS depth,
    bottom-up fold) and must exceed the graph diameter."""
    own_cache = graph.ensure_persisted()

    und = (
        graph.edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .persist()
    )
    sym = und.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        und.select(F.col("v").alias("a"), F.col("u").alias("b"))
    ).persist()

    verts = sym.select(F.col("a").alias("id")).distinct()

    # --- components: min-label fixpoint over the graph ---
    labels = verts.select("id", F.col("id").alias("label")).transform(
        fresh_checkpoint
    )
    for _ in range(max_rounds):
        gathered = (
            sym.join(labels.select(F.col("id").alias("a"), "label"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nl"))
        )
        new_labels = (
            labels.join(gathered, "id", "left")
            .select(
                "id",
                F.least("label", F.coalesce("nl", "label")).alias("label"),
            )
            .transform(fresh_checkpoint)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"bridges: labeling did not converge in {max_rounds} rounds — "
            "raise max_rounds"
        )

    # --- multi-source BFS from each component's min id ---
    depth = labels.select(
        "id",
        F.when(F.col("id") == F.col("label"), F.lit(0).cast("long")).alias(
            "depth"
        ),
    ).transform(fresh_checkpoint)
    labels.unpersist()
    for _ in range(max_rounds):
        gathered = (
            sym.join(
                depth.filter(F.col("depth").isNotNull()).select(
                    F.col("id").alias("a"), "depth"
                ),
                "a",
            )
            .groupBy(F.col("b").alias("id"))
            .agg((F.min("depth") + 1).alias("nd"))
        )
        new_depth = (
            depth.join(gathered, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("depth").isNull() & F.col("nd").isNotNull(),
                    F.col("nd"),
                )
                .otherwise(F.col("depth"))
                .alias("depth"),
            )
            .transform(fresh_checkpoint)
        )
        remaining = new_depth.filter(F.col("depth").isNull()).limit(1).count()
        depth.unpersist()
        depth = new_depth
        if remaining == 0:
            break
    else:
        raise RuntimeError(
            f"bridges: BFS depth exceeds {max_rounds} rounds — raise "
            "max_rounds (bridges would be silently wrong otherwise)"
        )

    # --- BFS-tree parent: min neighbor one level up ---
    d_a = depth.select(F.col("id").alias("a"), F.col("depth").alias("da"))
    d_b = depth.select(F.col("id").alias("b"), F.col("depth").alias("db"))
    parent = (
        sym.join(d_a, "a")
        .join(d_b, "b")
        .filter(F.col("da") == F.col("db") - 1)
        .groupBy(F.col("b").alias("id"))
        .agg(F.min("a").alias("parent"))
    )

    # --- non-tree edges: und minus the (parent, child) tree set ---
    tree = parent.select(
        F.least("parent", "id").alias("u"),
        F.greatest("parent", "id").alias("v"),
    )
    nontree = und.join(tree, ["u", "v"], "left_anti")
    h_rows = nontree.select(
        F.col("u").alias("id"), _hash60(F.col("u"), F.col("v")).alias("h")
    ).unionByName(
        nontree.select(
            F.col("v").alias("id"), _hash60(F.col("u"), F.col("v")).alias("h")
        )
    )
    hv = h_rows.groupBy("id").agg(F.bit_xor("h").alias("h"))

    state = (
        depth.join(parent, "id", "left")
        .join(hv, "id", "left")
        .select(
            "id",
            "depth",
            "parent",
            F.coalesce("h", F.lit(0)).alias("s"),
        )
        .transform(fresh_checkpoint)
    )
    depth.unpersist()
    max_depth = state.agg(F.max("depth").alias("m")).collect()[0]["m"] or 0

    # --- bottom-up subtree XOR, one depth level per round ---
    for d in range(int(max_depth), 0, -1):
        fold = (
            state.filter(F.col("depth") == d)
            .groupBy(F.col("parent").alias("id"))
            .agg(F.bit_xor("s").alias("child_x"))
        )
        new_state = (
            state.join(fold, "id", "left")
            .select(
                "id",
                "depth",
                "parent",
                F.when(
                    F.col("child_x").isNotNull(),
                    F.col("s").bitwiseXOR(F.col("child_x")),
                )
                .otherwise(F.col("s"))
                .alias("s"),
            )
            .transform(fresh_checkpoint)
        )
        state.unpersist()
        state = new_state

    out = state.filter(
        F.col("parent").isNotNull() & (F.col("s") == 0)
    ).select(
        F.least("parent", "id").alias("u"),
        F.greatest("parent", "id").alias("v"),
    )
    result = out.transform(fresh_checkpoint)
    und.unpersist()
    sym.unpersist()
    state.unpersist()
    if own_cache:
        graph.unpersist()
    return result
