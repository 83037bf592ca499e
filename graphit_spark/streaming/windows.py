"""Stateful streaming sessionization over the events stream.

The reference is batch-only (SURVEY.md §2.8); watermarked tumbling
windows already live in streaming/ingest.py (windowed_event_counts).
This module adds the custom-stateful-operator path — the streaming twin
of the batch `events_sessions` query (textqueries.py), with semantics
fixed windows cannot express (gap-based sessions):

`sessionize`: `applyInPandasWithState` keyed by user. State per user is
one open-session triple (start, last, n); closed sessions emit in the
micro-batch that observes the closing gap, and the event-time timeout
flushes a user's final open session once the watermark passes
last_ts + gap. Batches arrive Arrow-vectorized (pandas), never
row-at-a-time Python; the shuffle keys on user_id exactly like the
batch window partitioning, so scale-out matches the batch twin.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

SESSION_GAP_SEC = 1800.0
# the fold works in exact integer MICROSECONDS (epoch us fits double's
# 2^53 exactly through 2255; float seconds derived from int64 ns lose
# sub-us precision on modern epochs and produce Arrow-unsafe
# non-us-aligned timestamps)
SESSION_GAP_US = int(SESSION_GAP_SEC * 1_000_000)

# State-unit upgrade guard: the fold once carried (start, last) as epoch
# SECONDS under the very same (double, double, long) state schema; a
# checkpoint written by that code and resumed here would silently be
# reinterpreted as microseconds (1.7e9 "us" ≈ 1970), instantly closing
# the carried session with 1970-era timestamps. The floor separates the
# unit domains: epoch seconds stay ≤ ~4e9 and epoch MILLIseconds ≤
# ~4e12 for this century, while any epoch-us value from 1973-03 onward
# is ≥ 1e14 (real event times are ≥ ~1.5e15, i.e. 2017+) — so carried
# values below 1e14 can only be a pre-change checkpoint (or a future
# unit regression), and we fail loudly instead of emitting garbage.
_MIN_PLAUSIBLE_STATE_US = 1e14


def _check_state_units(last: float) -> None:
    if last is not None and last < _MIN_PLAUSIBLE_STATE_US:
        raise ValueError(
            "sessionize: carried state last=%r is implausibly small for "
            "epoch MICROSECONDS — this checkpoint was written by the "
            "pre-microsecond (epoch-seconds) sessionizer. Discard the "
            "old checkpoint directory and restart the stream; resuming "
            "would emit 1970-era sessions." % (last,)
        )


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(events_dir)
    )


SESSION_OUT_SCHEMA = (
    "user_id long, start_ts timestamp, end_ts timestamp, n_events long"
)
_STATE_SCHEMA = "start double, last double, n long"


def _make_sessionize_fn(with_timeout: bool):
    """Per-user gap sessionizer. State = one open session (start epoch,
    last epoch, count). The within-batch fold is fully vectorized
    (numpy sort → diff → gap-break cumsum → groupby-agg); scalar state
    is touched only at the batch boundary — merging the carried open
    session with the batch's first session, and carrying out the last."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        import numpy as np

        user = key[0]
        if state.hasTimedOut:
            # watermark passed the open session's gap horizon: flush it
            start, last, n = state.get
            _check_state_units(last)
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "start_ts": [pd.Timestamp(int(start), unit="us")],
                    "end_ts": [pd.Timestamp(int(last), unit="us")],
                    "n_events": [n],
                }
            )
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        _check_state_units(last)
        closed = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # one global sort over the whole micro-batch (ties on
            # event_id like the batch twin; only ts drives the gaps)
            batch = pd.concat(chunks, ignore_index=True)
            order = np.lexsort(
                (batch["event_id"].to_numpy(), batch["ts"].to_numpy())
            )
            sec = (
                batch["ts"].to_numpy("datetime64[ns]")[order].astype("int64")
                // 1000
            )  # exact epoch microseconds
            brk = np.empty(len(sec), dtype=bool)
            brk[0] = start is None or sec[0] - last > SESSION_GAP_US
            brk[1:] = np.diff(sec) > SESSION_GAP_US
            sid = np.cumsum(brk)  # 0 = continues the carried open session
            # per-session (start, last, n): sec is sorted, so firsts and
            # lasts are the break positions / their predecessors
            first_idx = np.flatnonzero(
                np.concatenate(([True], sid[1:] != sid[:-1]))
            )
            last_idx = np.concatenate((first_idx[1:] - 1, [len(sec) - 1]))
            counts = np.diff(np.concatenate((first_idx, [len(sec)])))
            sessions = list(
                zip(sec[first_idx], sec[last_idx], counts.tolist())
            )
            if start is not None:
                if brk[0]:
                    closed.append((start, last, n))
                else:
                    s0, l0, c0 = sessions[0]
                    sessions[0] = (start, max(last, l0), n + c0)
            closed.extend(sessions[:-1])
            start, last, n = sessions[-1]
        # state schema is (double, double, long): numpy int64 us values
        # must go in as Python floats (exact — epoch us < 2^53) or the
        # state row serializes as null and the carried session is lost
        state.update((
            None if start is None else float(start),
            None if last is None else float(last),
            int(n),
        ))
        if with_timeout:
            # must land strictly past the current watermark or Spark
            # rejects it — a session whose horizon the watermark already
            # passed flushes at the next watermark tick instead
            horizon = int(last + SESSION_GAP_US) // 1000
            state.setTimeoutTimestamp(
                max(horizon, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "start_ts": [
                        pd.Timestamp(int(s), unit="us") for s, _, _ in closed
                    ],
                    "end_ts": [
                        pd.Timestamp(int(e), unit="us") for _, e, _ in closed
                    ],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def sessionize(
    events: DataFrame,
    watermark: str = "2 hours",
    timeout: str = "EventTimeTimeout",
) -> DataFrame:
    """Streaming gap-sessionization via applyInPandasWithState — the
    stateful path for semantics fixed windows cannot express. A closed
    session emits in the micro-batch that observes the closing gap;
    the event-time timeout flushes a user's final open session once the
    watermark passes last_ts + gap. Pass timeout="NoTimeout" (and any
    watermark) for deterministic drive-by-hand tests where only
    gap-closed sessions should emit."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_fn(timeout != "NoTimeout"),
            SESSION_OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            timeout,
        )
    )
