"""Gap-based sessionization over an event stream (batch form).

The classic lag → new-session flag → running sum → per-session aggregate
pattern: two shuffles total (both on user_id — the second reuses the
first's partitioning), fully window/aggregate native, deterministic.

The streaming twin of this operator is ``applyInPandasWithState`` /
``session_window`` in streaming/; the batch form is what backfills and
the oracle both use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a session_id to every event: a new session starts when the
    gap to the user's previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_minutes * 60)
    ).cast("int")
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per (user, session): event count, span seconds, total value."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("span_sec"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
