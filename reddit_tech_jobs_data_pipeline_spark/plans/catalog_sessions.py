"""Sessionization + distinct-count catalog entries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.sessions import session_stats
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "user_sessions",
    """
    WITH secs AS (
      -- whole-second epoch per event, matching Spark unix_timestamp's
      -- truncation (DuckDB epoch() is fractional)
      SELECT event_id, user_id, ts, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts, value, e,
        CASE WHEN lag(e) OVER w IS NULL OR e - lag(e) OVER w > 30 * 60
             THEN 1 ELSE 0 END AS new_session
      FROM secs
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, value, e,
        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           max(e) - min(e) AS span_sec,
           round(sum(value), 2) AS total_value
    FROM sessioned GROUP BY user_id, session_seq
    """,
    tags=["window", "sessionization"],
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return session_stats(ev, gap_minutes=30)


@register(
    "distinct_users_by_type",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
    tags=["agg", "distinct"],
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (expand-based two-phase in Spark). The approximate
    HLL twin (approx_count_distinct) is covered in tests with a tolerance
    bound — approximate values cannot hash-match an oracle."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
