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


@register(
    "session_window_native",
    """
    WITH ms AS (
      -- millisecond truncation on BOTH engines: the parquet ts encoding
      -- has been nanos and micros across testdata generations, and the
      -- two engines truncate to their native precision differently at
      -- sub-ms resolution; comparing at ms makes the gap arithmetic
      -- encoding-proof (same rationale as user_sessions' whole-second e)
      SELECT user_id, value, epoch_ms(ts) AS tms FROM events
    ),
    flagged AS (
      SELECT user_id, value, tms,
        CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000
             THEN 1 ELSE 0 END AS new_session
      FROM ms WINDOW w AS (PARTITION BY user_id ORDER BY tms)
    ),
    sessioned AS (
      SELECT user_id, value, tms,
        sum(new_session) OVER (PARTITION BY user_id ORDER BY tms
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
      FROM flagged
    )
    SELECT user_id, min(tms) AS session_start_ms,
           max(tms) + 1800000 AS session_end_ms,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM sessioned GROUP BY user_id, seq
    """,
    tags=["window", "sessionization", "streaming-semantics"],
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``F.session_window`` (the groupBy form that also runs
    unchanged under readStream): dynamic-gap sessions per user, window
    end = last event + gap. Complements the applyInPandasWithState
    sessionizer (custom per-session state) and the lag/flag/sum batch
    operator (user_sessions) — three expressions of one semantic, this
    one letting Spark's session-window aggregation do the merging. Gap
    boundary is INCLUSIVE (an exactly-30-min gap merges — verified
    empirically), which the oracle mirrors with ``> 1800000``.
    Timestamps are ms-truncated on both engines first; see oracle
    comment. One shuffle on user_id; state (streaming) bounded by the
    watermark as usual."""
    ev = _t(spark, sf_dir, "events")
    ms = ev.select(
        "user_id",
        "value",
        F.timestamp_millis(F.unix_millis("ts")).alias("tsm"),
    )
    agg = ms.groupBy("user_id", F.session_window("tsm", "30 minutes").alias("sw")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return agg.select(
        "user_id",
        F.unix_millis("sw.start").alias("session_start_ms"),
        F.unix_millis("sw.end").alias("session_end_ms"),
        "n_events",
        "total_value",
    )


@register(
    "bitmap_distinct_rollup",
    """
    SELECT CAST(month(ts) AS INTEGER) AS m,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY 1
    """,
    tags=["agg", "distinct", "bitmap", "scale"],
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-rollup distinct counting (Spark 4 bitmap aggregates): each
    (month, day) gets a compressed user-id bitmap
    (bitmap_construct_agg), and monthly distincts come from OR-merging
    the daily bitmaps — NOT from re-scanning events. This is the
    materializable distinct-count primitive at 100 TB: daily bitmaps
    persist as bytes, any coarser rollup (week, month, campaign window)
    is a cheap bitmap_or_agg over them, and unlike HLL/KMV the answer
    stays EXACT — which is why the plain COUNT(DISTINCT) oracle can
    gate it with a hash match."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        F.month("ts").alias("m"), F.dayofmonth("ts").alias("d"), "user_id"
    ).groupBy("m", "d").agg(
        # +1: bitmap_bit_position is 1-based (position = value - 1); id 0
        # would alias — the shift is a bijection, distinct count unchanged
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id") + 1)).alias("bm")
    )
    return daily.groupBy("m").agg(
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("distinct_users")
    ).select(F.col("m").cast("int").alias("m"), "distinct_users")


@register(
    "bitmap_rolling_distinct",
    """
    WITH days AS (SELECT DISTINCT dayofyear(ts) AS d FROM events)
    SELECT days.d,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS rolling7_users
    FROM days JOIN events e
      ON dayofyear(e.ts) BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
    tags=["agg", "distinct", "bitmap", "window", "scale"],
)
def bitmap_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day EXACT distinct users from daily bitmaps: one
    bitmap per day, window ``bitmap_or_agg`` over the trailing 7 rows,
    ``bitmap_count`` of the union. The window runs over the DAILY table
    (365 rows/year of bitmap bytes), never the event stream — a year of
    rolling exact distincts costs one scan to build the bitmaps plus a
    365-row window, where the naive form (the oracle's range self-join)
    re-counts every 7-day slice of raw events. Exactness is what
    separates this from HLL rollups; the oracle's per-slice
    COUNT(DISTINCT) must agree row-for-row."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.dayofyear("ts").alias("d"), "user_id")
        .groupBy("d")
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id") + 1)).alias("bm"))
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.withColumn(
        "rolling7_users", F.bitmap_count(F.bitmap_or_agg("bm").over(w))
    ).select(F.col("d").cast("long").alias("d"), "rolling7_users")


@register(
    "bitmap_retention",
    """
    WITH m AS (
      SELECT DISTINCT CAST((dayofyear(ts) - 1) // 7 AS BIGINT) AS m, user_id
      FROM events
    ),
    months AS (SELECT DISTINCT m FROM m),
    pairs AS (
      SELECT a.m AS m_from, b.m AS m_to FROM months a JOIN months b ON b.m = a.m + 1
    )
    SELECT p.m_from, p.m_to,
           CAST(count(DISTINCT CASE WHEN x.user_id IS NOT NULL AND y.user_id IS NOT NULL
                                    THEN x.user_id END) AS BIGINT) AS retained
    FROM pairs p
    LEFT JOIN m x ON x.m = p.m_from
    LEFT JOIN m y ON y.m = p.m_to AND y.user_id = x.user_id
    GROUP BY p.m_from, p.m_to
    """,
    tags=["agg", "distinct", "bitmap", "retention", "scale"],
)
def bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retained users from PERSISTED weekly bitmaps,
    via inclusion-exclusion: |A ∩ B| = |A| + |B| − |A ∪ B| — Spark ships
    or_agg but no and_agg, and the identity makes intersections free
    anyway. Each consecutive month pair is one row of bitmap arithmetic
    over the (months × bitmap-bytes) table; the raw events are scanned
    once ever, not once per cohort question — the same materializable-
    bitmap story as bitmap_distinct_rollup extended to set ALGEBRA, and
    still exact (the oracle's distinct self-join must agree)."""
    ev = _t(spark, sf_dir, "events")
    monthly = (
        ev.select(
            F.floor((F.dayofyear("ts") - 1) / 7).cast("long").alias("m"), "user_id"
        )
        .groupBy("m")
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id") + 1)).alias("bm"),
            F.countDistinct("user_id").alias("cnt"),
        )
    )
    a = monthly.select(F.col("m").alias("m_from"), F.col("bm").alias("bm_a"), F.col("cnt").alias("ca"))
    b = monthly.select(F.col("m").alias("m_to"), F.col("bm").alias("bm_b"), F.col("cnt").alias("cb"))
    pairs = a.join(b, F.col("m_to") == F.col("m_from") + 1)
    # |A ∪ B| via or_agg over the two bitmaps of the pair
    unioned = (
        pairs.select(
            "m_from", "m_to", "ca", "cb",
            F.explode(F.array("bm_a", "bm_b")).alias("bm"),
        )
        .groupBy("m_from", "m_to", "ca", "cb")
        .agg(F.bitmap_count(F.bitmap_or_agg("bm")).alias("cu"))
    )
    return unioned.select(
        "m_from",
        "m_to",
        (F.col("ca") + F.col("cb") - F.col("cu")).cast("long").alias("retained"),
    )
