from graphit_spark.streaming.incremental import (
    incremental_cc_stream,
    incremental_lsh_dedup_stream,
    incremental_pagerank_stream,
)
from graphit_spark.streaming.dedup import dedup_stream
from graphit_spark.streaming.sketches import cms_stream, hll_stream
from graphit_spark.streaming.ingest import (
    stream_pages_to_edges,
    windowed_event_counts,
)
from graphit_spark.streaming.windows import read_events_stream, sessionize

__all__ = [
    "dedup_stream",
    "cms_stream",
    "hll_stream",
    "stream_pages_to_edges",
    "windowed_event_counts",
    "read_events_stream",
    "sessionize",
    "incremental_pagerank_stream",
    "incremental_cc_stream",
    "incremental_lsh_dedup_stream",
]
