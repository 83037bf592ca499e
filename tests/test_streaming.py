"""Structured-Streaming ingest tests: file-fed streams driven to
completion synchronously (processAllAvailable / availableNow)."""

import os

from pyspark.sql import functions as F

from graphit_spark.datagen import gen_pages
from graphit_spark.streaming import stream_pages_to_edges, windowed_event_counts


def test_stream_pages_to_edges_incremental(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")

    all_pages = gen_pages(spark, 200, num_partitions=4)
    # first drop: half the crawl
    all_pages.filter(F.xxhash64("url") % 2 == 0).write.mode("overwrite").parquet(pages_dir)
    q = stream_pages_to_edges(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(120)

    first = spark.read.parquet(out_dir).count()
    assert first > 0

    # second drop: the rest — only the delta should be processed (append)
    all_pages.filter(F.xxhash64("url") % 2 == 1).write.mode("append").parquet(pages_dir)
    q2 = stream_pages_to_edges(spark, pages_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    edges = spark.read.parquet(out_dir)
    total = edges.count()
    assert total > first

    # streamed edge set == batch extraction of the same pages (by url hash)
    from graphit_spark.extract import extract_pages

    batch = (
        extract_pages(spark.read.parquet(pages_dir))
        .select(
            F.xxhash64("url").alias("src"),
            F.explode("links").alias("t"),
        )
        .select("src", F.xxhash64("t").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    assert (
        batch.exceptAll(edges.select("src", "dst")).count() == 0
        and edges.select("src", "dst").exceptAll(batch).count() == 0
    )


def test_windowed_event_counts(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # file-source stream fed from a bounded temp dir, drained synchronously
    import tempfile

    d = tempfile.mkdtemp()
    events.withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(d + "/ev")
    stream = spark.readStream.schema(
        spark.read.parquet(d + "/ev").schema
    ).parquet(d + "/ev")
    agg = windowed_event_counts(spark, stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("wincounts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT sum(n) AS total FROM wincounts"
    ).collect()[0]["total"]
    assert got == events.count()
