"""Deterministic sampling + time-series gap filling.

Universe sampling (hash the key, keep a hex-prefix band) is the
reproducible sampling method for distributed pipelines: the same rows are
selected on any engine, any run, any partitioning — unlike rand(seed),
which is partitioning-dependent in Spark and engine-specific everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "deterministic_sample",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
    """,
    tags=["sampling"],
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/16 universe sample keyed on the row identity (md5 hex prefix).
    Engine-independent and stable under repartitioning — the property
    rand(seed) cannot give on a cluster."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"), F.lit("|"), F.col("l_linenumber").cast("string")
        )
    )
    return li.filter(F.substring(key, 1, 1) == "0").select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("l_extendedprice")
    )


@register(
    "daily_counts_gapfilled",
    """
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ),
    calendar AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n, round(sum(value), 2) AS v
      FROM events GROUP BY 1
    )
    SELECT strftime(c.day, '%Y-%m-%d') AS day,
           coalesce(n, 0) AS n_events,
           coalesce(v, 0.0) AS total_value
    FROM calendar c LEFT JOIN daily d ON c.day = d.day
    """,
    tags=["time", "gapfill"],
)
def daily_counts_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine (sequence + explode) left-joined to per-day
    aggregates, zeros for missing days — the standard time-series
    completeness operator; the spine is tiny and broadcasts."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    calendar = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v")
    )
    return (
        calendar.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("v"), F.lit(0.0)).alias("total_value"),
        )
    )
