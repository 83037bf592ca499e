"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship PageRank over the edge table derived from
                  sf0.001 testdata.
queries()       — every implemented operator (SURVEY.md §2) as
                  (spark, sf_dir) -> DataFrame callables.
oracle_sql()    — DuckDB-equivalent ANSI SQL per query (omitted only for
                  genuinely non-SQL-expressible ops, which get the
                  rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank on the derived link graph at sf0.001."""
    from graphit_spark.benchqueries import q_pagerank

    return q_pagerank(spark, "/root/testdata/sf0.001")


def _all_queries() -> dict[str, tuple]:
    from graphit_spark.benchqueries import GRAPH_QUERIES

    merged = {}
    merged.update(GRAPH_QUERIES)
    try:
        from graphit_spark.textqueries import TEXT_QUERIES

        merged.update(TEXT_QUERIES)
    except ImportError:
        pass
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in _all_queries().items()
        if sql is not None
    }
