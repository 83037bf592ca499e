"""Edge-list file sources/sinks — the reference's text graph formats.

Reference reader (src/runtime_lib/infra_gapbs/reader.h): ``.el`` (:51
ReadInEL — "src dst" per line), ``.wel`` (:60 ReadInWEL — "src dst w"),
``.mtx`` (:147 — 1-indexed MatrixMarket with a size header), comment lines
starting with '%' or '#' skipped. The serialized binary formats (.sg/.wsg)
are GAPBS-internal and out of scope — Parquet is the at-scale format here.

Loading applies NO squish (that is LinkGraph's job, matching the
reference where MakeGraph squishes after reading)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _read_tokens(spark: SparkSession, path: str, n_cols: int) -> DataFrame:
    lines = spark.read.text(path).filter(
        (F.length(F.trim("value")) > 0)
        & ~F.trim("value").startswith("%")
        & ~F.trim("value").startswith("#")
    )
    toks = lines.select(F.split(F.trim("value"), r"\s+").alias("t"))
    cols = [F.element_at("t", i + 1).cast("long").alias(c)
            for i, c in enumerate(["src", "dst", "weight"][:n_cols])]
    return toks.select(*cols)


def read_edge_list(spark: SparkSession, path: str) -> DataFrame:
    """.el → (src, dst)."""
    return _read_tokens(spark, path, 2)


def read_weighted_edge_list(spark: SparkSession, path: str) -> DataFrame:
    """.wel → (src, dst, weight)."""
    return _read_tokens(spark, path, 3)


def read_mtx(spark: SparkSession, path: str) -> DataFrame:
    """MatrixMarket: skip '%' comments AND the first non-comment line
    (the dimension header), convert 1-indexed ids to 0-indexed
    (reader.h:147-200)."""
    lines = (
        spark.read.text(path)
        .filter((F.length(F.trim("value")) > 0) & ~F.trim("value").startswith("%"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    body = lines.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") > 1)
    toks = body.select(F.split(F.trim("value"), r"\s+").alias("t"))
    return toks.select(
        (F.element_at("t", 1).cast("long") - 1).alias("src"),
        (F.element_at("t", 2).cast("long") - 1).alias("dst"),
    )


def write_edge_list(edges: DataFrame, path: str) -> None:
    """Sink: one "src dst[ weight]" line per edge (reference print/output
    parity format)."""
    cols = [F.col(c).cast("string") for c in edges.columns]
    edges.select(F.concat_ws(" ", *cols).alias("value")).write.mode(
        "overwrite"
    ).text(path)
