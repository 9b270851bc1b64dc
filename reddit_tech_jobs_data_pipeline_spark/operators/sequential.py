"""Inherently-sequential per-key scans via ``applyInPandas``.

Some recurrences cannot be phrased as window functions: when the state
carried between rows is CLAMPED (capped/floored), the per-row result is
not a prefix aggregate — ``bal_t = clamp(bal_{t-1} + x_t)`` depends on
every intermediate clamp. SQL needs a recursive CTE; Spark's native
surface has neither recursion nor ordered-scan UDAFs, so this is the
designed use of the grouped-map escape hatch: one Arrow batch per key,
a tight Python loop inside, distributed across keys.

Scale notes (100 TB): parallelism = number of keys (users), which is
the natural shard for this recurrence — each group's scan is O(rows)
and groups are independent. One shuffle on the key. The group's rows
must fit in one Arrow batch (per-user event counts are bounded in
practice; cap/window long tails upstream). Python-per-row cost is paid
only inside the loop — everything else stays JVM-side.

Determinism: rows ordered by (ts, event_id) inside the group; Python
float arithmetic is IEEE-754 double in the same sequence as the
oracle's recursive CTE, so results match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

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

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        bal = 0.0
        out = []
        for v in pdf["value"]:
            bal = max(floor, min(cap, bal + v + drift))
            out.append(bal)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "balance": out,
            }
        )

    return events.select("user_id", "event_id", "ts", "value").groupBy(
        "user_id"
    ).applyInPandas(_scan, schema=BALANCE_SCHEMA)


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
    clamp/reset, so no window frame expresses it — this is the designed
    applyInPandas escape hatch, one Arrow batch per user, and the oracle
    is the identical recursive CTE. Same 100 TB shape as
    capped_running_balance: parallelism = #users, one shuffle."""

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = 0.0
        vals, alarms = [], []
        for v in pdf["value"]:
            s = max(0.0, s + v - target)
            fired = s > threshold
            vals.append(s)
            alarms.append(fired)
            if fired:
                s = 0.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "cusum": vals,
                "alarm": alarms,
            }
        )

    return events.select("user_id", "event_id", "ts", "value").groupBy(
        "user_id"
    ).applyInPandas(_scan, schema=CUSUM_SCHEMA)
