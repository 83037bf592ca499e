"""Streaming exact deduplication — first-seen filter with keyed state.

The batch `dedup_exact` query (functions/dedup.py, reference-free
pipeline surface) keeps min(doc_id) per content hash in one shuffle.
A crawl is a STREAM though: the pipeline wants every NEW document
forwarded in the micro-batch it arrives in, and every later copy
suppressed — semantics a stateless groupBy cannot express. This module
is the stateful-streaming twin:

`dedup_stream`: `applyInPandasWithState` keyed by the content hash
(md5 of the exact text bytes, the batch operator's key). State per
hash is (first doc_id, duplicates suppressed so far). A hash's FIRST
arrival emits one row; every subsequent arrival (same or later
micro-batch) only bumps the suppressed counter. Within one micro-batch
the canonical copy is min(doc_id) — deterministic under replay, and
identical to the batch keep-set when the stream delivers in doc_id
order (out-of-order streams keep first-SEEN, the streaming contract;
the divergence is inherent, not a bug, and pinned in tests).

Scale notes (100 TB crawl):
  - the shuffle keys on the content hash — uniform by construction, no
    skew; partial aggregation does not apply to stateful ops but each
    group's batch slice is Arrow-delivered and folded vectorized.
  - state size = one (hash, long, long) row per DISTINCT document —
    the same cardinality the batch groupBy's shuffle carries; on a
    real cluster back it with the RocksDB state store
    (`spark.sql.streaming.stateStore.providerClass`), which spills to
    disk per partition instead of holding the map on-heap.
  - for corpora where even that is too hot, the bloom-prefilter from
    functions/sketch.py composes in front (drop definite-new fast
    path); exactness then still comes from this operator, the bloom
    only thins the stateful shuffle.
  - NoTimeout: dedup state is permanent by design (a duplicate a year
    later is still a duplicate). Bound retention operationally by
    restarting with a fresh checkpoint per corpus epoch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DEDUP_OUT_SCHEMA = "doc_hash string, doc_id long, text_len long"
_STATE_SCHEMA = "first_id long, dups long"


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state):
    """Per-hash first-seen filter. The batch slice for one hash is tiny
    (duplicates of one document), so the fold is a min/len over the
    concatenated Arrow chunks — no per-row Python."""
    doc_hash = key[0]
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    batch = pd.concat(chunks, ignore_index=True)
    n = len(batch)
    if state.exists:
        first_id, dups = state.get
        state.update((int(first_id), int(dups) + n))
        return
    keep = batch.loc[batch["doc_id"].idxmin()]
    state.update((int(keep["doc_id"]), n - 1))
    yield pd.DataFrame(
        {
            "doc_hash": [doc_hash],
            "doc_id": [int(keep["doc_id"])],
            "text_len": [int(keep["text_len"])],
        }
    )


def dedup_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-seen exact dedup over a streaming documents DataFrame
    (needs `doc_id` and `text_col`). Emits (doc_hash, doc_id, text_len)
    once per distinct content hash, in the micro-batch of first
    arrival; duplicates are suppressed and counted in state. Append
    mode, no timeout (dedup state never expires — module docstring)."""
    keyed = docs.select(
        F.md5(F.col(text_col).cast("binary")).alias("doc_hash"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length(text_col).cast("long").alias("text_len"),
    )
    return keyed.groupBy("doc_hash").applyInPandasWithState(
        _dedup_fn,
        DEDUP_OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        "NoTimeout",
    )
