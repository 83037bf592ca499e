"""Structured-Streaming ingest: incremental crawl → edge table.

The reference is batch-only (SURVEY.md §2.8) — GraphIt has no streaming
constructs. This module is the engine's forward-looking ingest path: new
page files land in a directory (the sandbox stand-in for a Kafka/WARC
feed), links are extracted with the SAME vectorized Arrow UDFs as the
batch path, and edges append to the edge table. Kernels then resume from
the latest SnapshotStore checkpoint over the grown edge table
(incremental recompute; PageRankDelta bounds the work to changed ranks).

Streaming id assignment: the batch path's row_number dictionary is a
total sort — not expressible over an unbounded stream — so the streaming
path uses xxhash64(url) ids (stable, collision-negligible at 64 bits).
Downstream kernels are id-agnostic; the two id spaces must not be mixed
within one graph (document-level contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from graphit_spark.extract import extract_links_udf

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def stream_pages_to_edges(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Start (and return) a streaming query appending (src, dst, warc_ts)
    parquet as page files arrive. Exactly-once via the stream checkpoint;
    drive synchronously in tests with q.processAllAvailable()."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    edges = (
        pages.select(
            F.xxhash64("url").alias("src"),
            F.explode(extract_links_udf("html")).alias("target"),
            "warc_ts",
        )
        .select("src", F.xxhash64("target").alias("dst"), "warc_ts")
        .filter(F.col("src") != F.col("dst"))
    )
    return (
        edges.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    spark: SparkSession,
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window counts per event type — the standard
    late-data-tolerant streaming aggregation (append mode emits only
    finalized windows)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
