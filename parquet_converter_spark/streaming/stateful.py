"""Custom stateful streaming operator — applyInPandasWithState.

The engine's streaming surface so far is stateless per micro-batch
(foreachBatch encode) plus watermarked windowed aggs; this module adds
the arbitrary-stateful shape: per-conversation session tracking whose
state (turn count, per-role counts, first/last event time) survives
across micro-batches and emits an updated session row whenever a
conversation receives new turns. A processing-time timeout closes idle
sessions (emit-and-forget), bounding state size — the property that
matters at 10^12 conversations.

Reference lineage: the reference has no streaming at all; this is the
Structured Streaming analog of its per-file ConversionStats accumulation
(/root/reference/parquet_converter/stats.py:8-50) applied to an
unbounded source.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: state tuple layout: (turns, user_turns, assistant_turns, first_ts, last_ts)
_STATE_SCHEMA = "turns long, user_turns long, assistant_turns long, first_ts long, last_ts long"
_OUTPUT_SCHEMA = (
    "conv_id string, turns long, user_turns long, assistant_turns long, "
    "first_ts long, last_ts long, closed boolean"
)


def _track(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's turns for one conversation into state."""
    if state.hasTimedOut:
        turns, u, a, first_ts, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [(key[0], turns, u, a, first_ts, last_ts, True)],
            columns=[
                "conv_id", "turns", "user_turns", "assistant_turns",
                "first_ts", "last_ts", "closed",
            ],
        )
        return

    turns = u = a = 0
    first_ts = last_ts = None
    if state.exists:
        turns, u, a, first_ts, last_ts = state.get
    for pdf in pdfs:
        if not len(pdf):
            continue
        turns += len(pdf)
        u += int((pdf["role"] == "user").sum())
        a += int((pdf["role"] == "assistant").sum())
        # Arrow→pandas delivers ts as datetime64[ns]; drop NaT (a null ts
        # must not poison min/max with INT64_MIN) and convert ns → epoch
        # seconds
        ts = pdf["ts"].dropna()
        if len(ts):
            secs = ts.astype("int64") // 1_000_000_000
            lo, hi = int(secs.min()), int(secs.max())
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((turns, u, a, first_ts, last_ts))
    state.setTimeoutDuration(30_000)  # idle conversations close after 30s
    yield pd.DataFrame(
        [(key[0], turns, u, a, first_ts, last_ts, False)],
        columns=[
            "conv_id", "turns", "user_turns", "assistant_turns",
            "first_ts", "last_ts", "closed",
        ],
    )


def conversation_sessions(stream: DataFrame) -> DataFrame:
    """Per-conversation running session stats with cross-batch state.

    groupBy(conv_id).applyInPandasWithState — Spark shuffles each
    micro-batch by conv_id and feeds this group's Arrow batches plus its
    persisted state; output mode 'update' emits one row per touched
    conversation per batch, plus a final closed=true row on timeout.
    """
    return (
        stream.select("conv_id", "role", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _track,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
