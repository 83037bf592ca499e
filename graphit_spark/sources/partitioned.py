"""Hive-partitioned crawl layout: write/read with partition pruning.

A 100 TB crawl store is laid out by ingestion date (and often language)
so that incremental jobs touch only the slices they need — the Spark
counterpart of the reference's per-file graph inputs at web scale.
These helpers make the layout a first-class engine surface and the
partition-pruning behavior a TESTED contract (tests/test_plans.py
asserts the physical scan's PartitionFilters and that non-matching
partition directories contribute zero scanned files):

- `write_partitioned(df, path, cols)` — plain Hive layout
  (`col=value/` directories) via DataFrameWriter.partitionBy; caller
  picks LOW-cardinality columns (a date bucket, a language) — a
  high-cardinality partition column shatters the store into tiny files,
  so this module deliberately has no default column.
- `read_partitioned(spark, path)` — reopen; any filter on a partition
  column prunes at PLANNING time (PartitionFilters in the scan node),
  never reading pruned files' footers at all.
- `with_day(df, ts_col)` — derive the conventional `day` partition
  column (UTC date string) from a timestamp column.

At cluster scale the same layout is what makes compaction, retention
(drop old `day=` dirs), and backfill (overwrite one partition with
`spark.sql.sources.partitionOverwriteMode=dynamic`) cheap. Everything
here is a thin, declarative veneer over the writer API on purpose:
Catalyst owns the pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def with_day(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add the conventional `day` partition column (UTC date string)."""
    return df.withColumn("day", F.date_format(F.col(ts_col), "yyyy-MM-dd"))


def write_partitioned(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet Hive-partitioned by `cols` (in order)."""
    if not cols:
        raise ValueError("partition columns required (e.g. ['day'])")
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Reopen a write_partitioned store; partition-column filters prune
    at planning time."""
    return spark.read.parquet(path)
