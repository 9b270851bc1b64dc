"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

This is the escape hatch for session semantics the built-in
``session_window`` can't express (per-session custom payloads, early
emission rules, cross-batch carry-over with explicit state). State per
user = (session_seq, last_ts, n_events, total_value, first_ts); a
micro-batch extends or closes sessions; closed sessions are emitted,
the open one is carried in the GroupState. A processing-time timeout
flushes idle users' open sessions.

Scale notes: state is keyed by user — bounded by active-user cardinality,
not event volume; each micro-batch touches only keys present in the batch
plus timed-out keys; Arrow batches keep the Python hop amortized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("span_sec", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("first_ts", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def make_session_fn(gap_seconds: int = 1800, timeout_ms: int | None = None):
    """Build the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState``; factored out so batch tests can drive it.

    ``timeout_ms`` enables processing-time flushing of idle users' open
    sessions — for continuously-running deployments. Leave None for
    bounded replays (availableNow): a processing-time timeout keeps
    scheduling wake-up micro-batches and the run never drains."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                seq, first_ts, last_ts, n, tot = state.get
                state.remove()
                yield pd.DataFrame(
                    [
                        {
                            "user_id": user_id,
                            "session_seq": seq,
                            "n_events": n,
                            "span_sec": int(last_ts - first_ts),
                            "total_value": round(tot, 2),
                            "closed": True,
                        }
                    ]
                )
            return

        events = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "event_id"])
        if state.exists:
            seq, first_ts, last_ts, n, tot = state.get
        else:
            seq, first_ts, last_ts, n, tot = 0, None, None, 0, 0.0

        out = []
        for _, row in events.iterrows():
            t = row["ts"].timestamp()
            if last_ts is not None and t - last_ts > gap_seconds:
                out.append(
                    {
                        "user_id": user_id,
                        "session_seq": seq,
                        "n_events": n,
                        "span_sec": int(last_ts - first_ts),
                        "total_value": round(tot, 2),
                        "closed": True,
                    }
                )
                seq, first_ts, n, tot = seq + 1, t, 0, 0.0
            if first_ts is None:
                first_ts = t
            last_ts = t
            n += 1
            tot += float(row["value"])

        state.update((seq, first_ts, last_ts, n, tot))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(out)

    return update


def streaming_sessionize(
    events: DataFrame, gap_seconds: int = 1800, timeout_ms: int | None = None
) -> DataFrame:
    """events stream -> closed-session stream. With ``timeout_ms`` set,
    idle users' open sessions flush on processing-time timeout (long-lived
    deployments); without it, open sessions stay in state (bounded
    replays)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds, timeout_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
