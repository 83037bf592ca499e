from graphit_spark.streaming.ingest import (
    stream_pages_to_edges,
    windowed_event_counts,
)
from graphit_spark.streaming.windows import read_events_stream, sessionize

__all__ = [
    "stream_pages_to_edges",
    "windowed_event_counts",
    "read_events_stream",
    "sessionize",
]
