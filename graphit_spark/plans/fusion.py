"""Kernel fusion — GraphIt's fuseApplyFunctions/fuseForLoop analogue.

Reference: include/graphit/frontend/high_level_schedule.h:67-81 exposes
``fuseForLoop``/``fuseApplyFunctions``/``fuseFields``, and
test/input_with_schedules/eigenvector_pr_fusion.gt demonstrates fusing
PageRank's and eigenvector centrality's edge functors into ONE generated
C++ edge traversal that updates both property arrays per edge visit
(lowered by src/midend/apply_expr_lower.cpp + the fused-functor pass).

Under Spark the payoff maps one-to-one: K kernels whose supersteps share
the same edge relation and grouping key normally each pay their own
``edges ⋈ state`` join and their own ``groupBy(dst)`` Exchange. Fusing
them means joining the edge table against ONE combined state and
computing every kernel's aggregate column in a SINGLE groupBy — one
E-sized scan and one shuffle where K kernels would have K. The saving is
exactly GraphIt's: traversal cost is shared, only the per-edge arithmetic
grows. ``fuseFields`` (struct-of-arrays → array-of-structs) is likewise
free here: the fused state DataFrame *is* the fused field layout.

Requirements mirror the reference's: the fused kernels must traverse the
same edge set in the same direction and reduce with decomposable
aggregates; iteration counts are reconciled by the caller (the reference
fuses loops only when trip counts match, high_level_schedule.h:67).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: reducer name -> aggregate factory; all three are decomposable, so
#: Catalyst's map-side partial aggregation (the NUMA merge-reduce
#: analogue) applies to every fused column at once.
_REDUCERS = {"sum": F.sum, "min": F.min, "max": F.max}


def fused_gather(
    edges: DataFrame,
    vertex_state: DataFrame,
    contribs: dict[str, Column | tuple[Column, str]],
    *,
    hint: str | None = None,
) -> DataFrame:
    """One edge scan, many gathers.

    ``contribs`` maps output-column name -> message expression over the
    src vertex's state columns (optionally ``(expr, reducer)`` with
    reducer in {"sum", "min", "max"}; default "sum"). Returns
    ``(id, <name>...)`` where id is the destination vertex — the fused
    equivalent of running ``gather_scatter`` once per kernel.

    The plan: edges ⋈ vertex_state ON src (ONE property lookup), then ONE
    groupBy(dst) emitting every kernel's aggregate — a single Exchange
    where K separate kernels would shuffle K times. Asserted live in
    tests/test_plans.py.
    """
    state = vertex_state.withColumnRenamed("id", "__src_id")
    if hint:
        state = state.hint(hint)
    msgs = edges.join(state, edges["src"] == state["__src_id"])
    aggs = []
    for name, spec in contribs.items():
        expr, reducer = spec if isinstance(spec, tuple) else (spec, "sum")
        aggs.append(_REDUCERS[reducer](expr).alias(name))
    return msgs.groupBy(F.col("dst").alias("id")).agg(*aggs)
