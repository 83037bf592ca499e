"""Pure-JVM synthetic edge generator for benchmarking.

Generates a power-law directed graph entirely with Spark SQL expressions
(range → sequence → explode → hash arithmetic): no Python in the loop, no
shuffle — each partition emits its own id range, exactly how a 100 TB
synthetic load would be produced on a cluster. Deterministic (integer
arithmetic, wrap-around on long overflow is fine and stable).

This is the bench-scale analogue of datagen.gen_pages (which goes through
real html + Arrow extraction); here we want kernel throughput, not ingest
throughput, so we emit edges directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

A = 2654435761
B = 1013904223
M31 = 2**31


def synth_edges(
    spark: SparkSession,
    num_vertices: int,
    avg_degree: int = 16,
    hub_fraction: float = 0.005,
    hub_degree: int = 256,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) with ~avg_degree out-edges per vertex; the first
    n*hub_fraction vertices get hub_degree instead, and 30% of all edges
    point into the hub set (heavy dst skew — the web-graph shape)."""
    n = num_vertices
    n_hubs = max(1, int(n * hub_fraction))
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    src = F.col("id")
    h0 = F.pmod(F.lit(A) * src + F.lit(B), F.lit(M31))
    deg = F.when(src < n_hubs, F.lit(hub_degree)).otherwise(
        F.lit(1) + F.pmod(h0, F.lit(2 * avg_degree - 1))
    )
    exploded = (
        spark.range(0, n, numPartitions=num_partitions)
        .select(src.alias("src"), F.explode(F.sequence(F.lit(0), deg - 1)).alias("t"))
    )
    # stay under long overflow (ANSI mode): reduce mod 2^31 before the
    # multiply so A * x <= 2.6e9 * 2.1e9 < 2^63
    x = F.pmod(F.col("src") * F.lit(1_000_003) + F.col("t"), F.lit(M31))
    h = F.pmod(F.lit(A) * x + F.lit(B), F.lit(M31))
    h10 = F.floor(h / F.lit(10)).cast("long")
    dst = F.when(F.pmod(h, F.lit(10)) < 3, F.pmod(h10, F.lit(n_hubs))).otherwise(
        F.pmod(h10, F.lit(n))
    )
    return exploded.select(
        "src", dst.cast("long").alias("dst")
    )


# Graph500 / GAPBS RMAT quadrant probabilities (reference:
# infra_gapbs/generator.h via builder.h:239-241 `-g` — the Kronecker
# recursion whose self-similar skew stresses partitioning differently
# from the power-law generator above).
RMAT_A, RMAT_B, RMAT_C = 0.57, 0.19, 0.19  # D = 1 - A - B - C = 0.05


def synth_rmat(
    spark: SparkSession,
    scale: int,
    avg_degree: int = 16,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) RMAT/Kronecker graph: 2^scale vertices,
    2^scale * avg_degree edges, Graph500 quadrant probabilities.

    Pure-JVM like synth_edges: spark.range over edge ids, then `scale`
    levels of quadrant choice, each driven by xxhash64(seed, edge, lvl)
    reduced to a 30-bit integer and compared against integer thresholds
    — a compile-time Python loop composing Column expressions, zero
    Python at execution, no shuffle (each partition emits its own edge
    id range). Deterministic for a given (scale, avg_degree, seed)."""
    n_edges = (1 << scale) * avg_degree
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    one = 1 << 30
    t_a = int(RMAT_A * one)
    t_ab = int((RMAT_A + RMAT_B) * one)
    t_abc = int((RMAT_A + RMAT_B + RMAT_C) * one)

    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        r = F.pmod(
            F.xxhash64(F.lit(seed), F.col("id"), F.lit(lvl)), F.lit(one)
        )
        # quadrants (src_bit, dst_bit): A=(0,0) B=(0,1) C=(1,0) D=(1,1)
        src_bit = F.when(r < t_ab, F.lit(0)).otherwise(F.lit(1))
        dst_bit = F.when(
            (r < t_a) | ((r >= t_ab) & (r < t_abc)), F.lit(0)
        ).otherwise(F.lit(1))
        src = src + (src_bit.cast("long") * F.lit(1 << lvl))
        dst = dst + (dst_bit.cast("long") * F.lit(1 << lvl))
    return spark.range(0, n_edges, numPartitions=num_partitions).select(
        src.alias("src"), dst.alias("dst")
    )
