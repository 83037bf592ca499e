"""Edge-list file sources/sinks — the reference's text graph formats.

Reference reader (src/runtime_lib/infra_gapbs/reader.h): ``.el`` (:51
ReadInEL — "src dst" per line), ``.wel`` (:60 ReadInWEL — "src dst w"),
``.mtx`` (:147 — 1-indexed MatrixMarket with a size header), comment lines
starting with '%' or '#' skipped. The serialized binary formats (.sg/.wsg)
live in sources/serialized.py — Parquet is the at-scale format here.

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
    """MatrixMarket (reader.h:147-200 ReadInMTX): the banner's field
    decides weights (pattern = none; real/double/integer = third token;
    complex rejected) and its symmetry decides direction (symmetric
    emits both directions; general/skew-symmetric as stored). Body
    skips '%' comments and the dimension header; ids convert from
    1-indexed to 0-indexed."""
    from pyspark.sql import Window

    raw = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    numbered = raw.withColumn("rn", F.row_number().over(w))
    banner = (
        numbered.filter(F.col("rn") == 1).collect()[0]["value"]
        .strip().lower().split()
    )
    field = banner[3] if len(banner) > 3 else "pattern"
    symmetry = banner[4] if len(banner) > 4 else "general"
    if field == "complex":
        raise ValueError("do not support complex weights for .mtx")
    read_weights = field in ("real", "double", "integer")
    if symmetry == "symmetric":
        undirected = True
    elif symmetry in ("general", "skew-symmetric"):
        undirected = False
    else:
        raise ValueError(f"unsupported .mtx symmetry: {symmetry}")

    lines = numbered.filter(
        (F.length(F.trim("value")) > 0) & ~F.trim("value").startswith("%")
    )
    w2 = Window.orderBy("rn")
    body = lines.withColumn("rn2", F.row_number().over(w2)).filter(
        F.col("rn2") > 1
    )
    toks = body.select(F.split(F.trim("value"), r"\s+").alias("t"))
    cols = [
        (F.element_at("t", 1).cast("long") - 1).alias("src"),
        (F.element_at("t", 2).cast("long") - 1).alias("dst"),
    ]
    if read_weights:
        # the reference parses into integral WeightT — truncate like it
        cols.append(
            F.element_at("t", 3).cast("double").cast("long").alias("weight")
        )
    out = toks.select(*cols)
    if undirected:
        back = [F.col("dst").alias("src"), F.col("src").alias("dst")]
        if read_weights:
            back.append(F.col("weight"))
        out = out.unionByName(out.select(*back))
    return out


def write_edge_list(edges: DataFrame, path: str) -> None:
    """Sink: one "src dst[ weight]" line per edge (reference print/output
    parity format)."""
    cols = [F.col(c).cast("string") for c in edges.columns]
    edges.select(F.concat_ws(" ", *cols).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def read_gr(spark: SparkSession, path: str) -> DataFrame:
    """DIMACS shortest-path ``.gr`` → (src, dst, weight): arc lines are
    "a u v w"; every other line (comments 'c', problem line 'p') is
    skipped. Ids are kept AS READ — the reference's ReadInGR
    (reader.h:70-85) does not re-index, so neither do we."""
    lines = spark.read.text(path).filter(F.trim("value").startswith("a "))
    toks = lines.select(F.split(F.trim("value"), r"\s+").alias("t"))
    return toks.select(
        F.element_at("t", 2).cast("long").alias("src"),
        F.element_at("t", 3).cast("long").alias("dst"),
        F.element_at("t", 4).cast("long").alias("weight"),
    )


def read_metis(spark: SparkSession, path: str) -> DataFrame:
    """Metis ``.graph`` → (src, dst[, weight]): header "n m [fmt]",
    then line k holds the (1-indexed) neighbors of vertex k-1;
    converted to 0-indexed like the reference (reader.h:88-145
    ReadInMetis). fmt codes mirror the reference exactly: 1 = edge
    weights (neighbor/weight tokens alternate → weighted output),
    0/absent/100 = unweighted; anything else rejected. Line numbering
    uses a global Window — a small-test-graph format, never the
    at-scale path (BENCH/PLANS.md)."""
    from pyspark.sql import Window

    # keep empty lines: a vertex with no neighbors is an empty line and
    # must still advance the vertex numbering (only '%' comments skip)
    lines = spark.read.text(path).filter(~F.trim("value").startswith("%"))
    w = Window.orderBy(F.monotonically_increasing_id())
    numbered = lines.withColumn("rn", F.row_number().over(w))
    header = numbered.filter(F.col("rn") == 1).select(
        F.split(F.trim("value"), r"\s+").alias("t")
    ).collect()[0]["t"]
    fmt = int(header[2]) if len(header) > 2 else 0
    if fmt not in (0, 1, 100):
        raise ValueError(f"metis fmt {fmt} not supported (reader.h:109)")
    toks = F.filter(F.split(F.trim("value"), r"\s+"), lambda x: x != "")
    body = numbered.filter(F.col("rn") > 1).select(
        (F.col("rn") - 2).alias("src"), toks.alias("t")
    )
    if fmt == 1:
        # neighbor/weight pairs alternate on the line
        pairs = F.arrays_zip(
            F.filter(F.col("t"), lambda x, i: i % 2 == 0).alias("nbr"),
            F.filter(F.col("t"), lambda x, i: i % 2 == 1).alias("w"),
        )
        return body.select(
            "src", F.explode(pairs).alias("p")
        ).select(
            "src",
            (F.col("p.nbr").cast("long") - 1).alias("dst"),
            F.col("p.w").cast("long").alias("weight"),
        )
    return body.select(
        "src", F.explode("t").alias("nbr")
    ).select("src", (F.col("nbr").cast("long") - 1).alias("dst"))
