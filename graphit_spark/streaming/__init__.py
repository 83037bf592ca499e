from graphit_spark.streaming.ingest import (
    stream_pages_to_edges,
    windowed_event_counts,
)

__all__ = ["stream_pages_to_edges", "windowed_event_counts"]
