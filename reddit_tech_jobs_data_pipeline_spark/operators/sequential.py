"""Inherently-sequential per-key scans via ``mapInPandas`` over
user-sorted partitions.

Some recurrences cannot be phrased as window functions: when the state
carried between rows is CLAMPED (capped/floored/reset), the per-row
result is not a prefix aggregate — ``bal_t = clamp(bal_{t-1} + x_t)``
depends on every intermediate clamp. SQL needs a recursive CTE; Spark's
native surface has neither recursion nor ordered-scan UDAFs, so this is
the designed Python escape hatch.

Execution shape: repartition on the key, sort each partition by
(key, ts, event_id), then ONE sequential pandas pass per partition with
key-change detection resetting the state. This replaced the
grouped-map ``applyInPandas`` form: that invokes the UDF once per
GROUP, and with tens of thousands of tiny per-user groups the per-group
Arrow slicing dominated (measured 4.3 s → 0.9 s for the capped balance
at sf0.1, and 6-10 s per micro-batch in the streaming CUSUM monitor).
State is carried across Arrow chunk boundaries inside the iterator —
a user may span chunks within a sorted partition.

Scale notes (100 TB): parallelism = shuffle partitions (keys hash
across them), each partition's scan is O(rows) with O(1) state.
One shuffle on the key. No group must fit in memory — chunks stream
through the iterator.

Determinism: rows ordered by (ts, event_id) inside each key; Python
float arithmetic is IEEE-754 double in the same sequence as the
oracle's recursive CTE, so results match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _key_sorted(events: DataFrame) -> DataFrame:
    return events.select("user_id", "event_id", "ts", "value").repartition(
        "user_id"
    ).sortWithinPartitions("user_id", "ts", "event_id")


def _partition_scan(
    events: DataFrame,
    step: Callable[[float, float], tuple[float, list]],
    init: float,
    schema: T.StructType,
    out_cols: list[str],
) -> DataFrame:
    """Shared sequential-scan driver: ``step(state, value) -> (new_state,
    [out_values...])`` applied in (ts, event_id) order per user, state
    reset to ``init`` at every user boundary."""

    def _scan(chunks: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_uid = None
        s = init
        for pdf in chunks:
            buf = {"event_id": [], "user_id": []}
            for c in out_cols:
                buf[c] = []
            for uid, eid, v in zip(pdf["user_id"], pdf["event_id"], pdf["value"]):
                uid = int(uid)
                if uid != cur_uid:
                    cur_uid = uid
                    s = init
                s, outs = step(s, v)
                buf["event_id"].append(int(eid))
                buf["user_id"].append(uid)
                for c, o in zip(out_cols, outs):
                    buf[c].append(o)
            if buf["user_id"]:
                yield pd.DataFrame(buf)

    return _key_sorted(events).mapInPandas(_scan, schema=schema)


BALANCE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("balance", T.DoubleType(), True),
    ]
)


def capped_running_balance(
    events: DataFrame,
    cap: float = 100.0,
    drift: float = -50.0,
    floor: float = 0.0,
) -> DataFrame:
    """Per-user running balance with clamping:
    ``bal_t = max(floor, min(cap, bal_{t-1} + value_t + drift))``,
    rows ordered by (ts, event_id), initial balance 0."""

    def step(bal: float, v: float):
        bal = max(floor, min(cap, bal + v + drift))
        return bal, [bal]

    return _partition_scan(events, step, 0.0, BALANCE_SCHEMA, ["balance"])


CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("cusum", T.DoubleType(), True),
        T.StructField("alarm", T.BooleanType(), False),
    ]
)


def cusum_scan(
    events: DataFrame,
    target: float = 55.0,
    threshold: float = 150.0,
) -> DataFrame:
    """One-sided CUSUM changepoint scan per user (Page 1954):
    ``s_t = max(0, s_{t-1} + value_t - target)``, alarm when
    ``s_t > threshold``, state resets to 0 after an alarm. Emits the
    post-update pre-reset statistic and the alarm flag per event.

    The reset makes this a clamped recurrence (like the capped balance
    above): the state after each row depends on every intermediate
    clamp/reset, so no window frame expresses it — the oracle is the
    identical recursive CTE. Same 100 TB shape as capped_running_balance:
    one shuffle on the key, sequential partition scan."""

    def step(s: float, v: float):
        s = max(0.0, s + v - target)
        fired = s > threshold
        out = (s, fired)
        if fired:
            s = 0.0
        return s, list(out)

    return _partition_scan(
        events, step, 0.0, CUSUM_SCHEMA, ["cusum", "alarm"]
    )
