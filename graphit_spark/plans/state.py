"""Iteration-state checkpointing that stays flat over hundreds of rounds.

Root cause this module exists for (measured on Spark 4.1.2, see
BENCH/PLANS.md "iterated checkpoint" entry): ``df.localCheckpoint()``
truncates the plan to a ``LogicalRDD`` but INHERITS the original plan's
``Statistics``. Join stats compose as PRODUCTS of child ``sizeInBytes``
(SizeInBytesOnlyStatsPlanVisitor), so when a fixpoint kernel's round
plan references its own state more than once — CC's gather + two
pointer-jump hops (state appears twice per join), k-truss's decrement
(scored joined against peel-derived-from-scored), BFS/SSSP's
merge-with-candidates — the checkpointed state's inherited sizeInBytes
bit-length MULTIPLIES each round. The number stays a BigInteger, so
nothing overflows; instead every stats call (join planning,
InjectRuntimeFilter, AQE) pays Toom-Cook multiplication on an integer
whose bit-length grows geometrically: profiled at 2.0 s → 6.3 s →
28 s → 90 s per pointer-jump hop on a 1.5k-vertex warm CC run, with a
jstack showing 380+ s of driver CPU inside BigInteger.multiply under
``SizeInBytesOnlyStatsPlanVisitor``, and an OutOfMemoryError at
default driver memory. Flat 42-node plans, bounded storage, constant
job counts — exactly the "iterated localCheckpoint chain degrades
superlinearly" symptom kernels/truss.py previously worked around with
a parquet spill (parquet reads reset stats to real file sizes, which
is why that worked).

``fresh_checkpoint`` fixes it at the source: checkpoint eagerly, then
rebuild the DataFrame from the SAME checkpointed InternalRow RDD via
``SparkSession.internalCreateDataFrame`` — no recomputation, no
Python-side row round-trip, and the rebuilt ``LogicalRDD`` carries no
inherited stats (it reports the session default sizeInBytes, a
CONSTANT, so round N+1's products are the same size as round 1's).
Kernels that want a broadcast of the small state still get one: they
hint it explicitly (F.broadcast), which bypasses size estimation.

``internalCreateDataFrame`` is ``private[sql]`` in Scala — public in
bytecode, reachable from py4j, and stable across Spark 3.x/4.x — but
guard anyway: any failure falls back to the plain checkpointed frame,
which is merely slower, never wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fresh_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint(eager) + strip inherited Statistics.

    Drop-in replacement for ``df.localCheckpoint(eager=True)`` in
    fixpoint loops. Returns a DataFrame over the checkpointed RDD whose
    stats do not compound across rounds (see module docstring).
    """
    ck = df.localCheckpoint(eager=True)
    try:
        spark = ck.sparkSession
        jdf = ck._jdf
        stripped = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(stripped, spark)
    except Exception:  # pragma: no cover - py4j surface drift
        return ck
