"""The full EP1 pipeline as one idempotent incremental job.

Reference trace (SURVEY.md §3 EP1): watermark probe → scrape from
watermark → transform → upsert — four Airflow tasks crossing
JSON-over-Postgres between each. Here it is one lazy Spark lineage with
exactly two materialization points: the scalar watermark probe and the
partition-pruned gold write.

Idempotence contract (reference achieves it via ON CONFLICT): running the
same batch twice leaves the gold table unchanged — property-tested in
tests/test_jobs.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark import pipeline
from reddit_tech_jobs_data_pipeline_spark.operators.merge import watermark_lower_bound
from reddit_tech_jobs_data_pipeline_spark.sources import sink


def run_with_retries(fn, retries: int = 3, delay_s: float = 300.0, on_failure=None):
    """O3 — job-level retry policy (reference: Airflow ``retries=3`` /
    5-min delay / failure callback, dags/dag.py:423-441). Spark handles
    task-level retries itself; this wraps whole-job attempts."""
    import time

    last = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            last = e
            if on_failure is not None:
                on_failure(attempt, e)
            if attempt < retries:
                time.sleep(delay_s)
    raise last


def run_incremental(
    spark: SparkSession,
    raw: DataFrame,
    gold_path: str,
    now: dt.datetime,
    lookback_days: int = 30,
    fallback_days: int = 7,
) -> int:
    """One scheduled run: watermark → filter raw forward → transform →
    upsert. Returns the number of rows merged (0 ⇒ the O4 short-circuit:
    nothing written, schema untouched)."""
    try:
        gold = spark.read.parquet(gold_path)
        wm = watermark_lower_bound(
            gold, "created_datetime", now=now,
            lookback_days=lookback_days, fallback_days=fallback_days,
        )
        bootstrap = False
    except Exception:  # noqa: BLE001 — first run: no gold yet
        wm = now - dt.timedelta(days=fallback_days)
        bootstrap = True

    fresh = raw.filter(F.col("created_datetime") >= F.lit(wm))
    silver = pipeline.transform(fresh).withColumn("ingest_ts", F.lit(now))
    silver = silver.select(
        "post_id", "title", F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("string").alias("text"), F.lit(None).cast("string").alias("author"),
        F.lit(None).cast("string").alias("subreddit"), "created_datetime",
        F.lit(None).cast("int").alias("upvotes"), F.lit(None).cast("int").alias("comments_count"),
        "salary_currency", "lower_salary", "upper_salary", "job_position",
        "location", "field", "technologies", "ingest_ts",
    )
    n = silver.count()
    if n == 0:
        return 0
    if bootstrap:
        sink.write_gold(silver, gold_path)
    else:
        sink.upsert_gold(spark, gold_path, silver)
    return n
