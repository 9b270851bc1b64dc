"""Readers for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a sf directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin the session timezone: every catalog query's timestamp→string
    # formatting must be UTC regardless of whose SparkSession runs it
    # (the DuckDB oracle reads the same parquet as naive/UTC instants).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts encoding varies across testdata generations; normalize
        # every variant to TIMESTAMP (LTZ) so downstream unix_millis/
        # unix_micros/withWatermark (which reject NTZ) always work:
        #   - TIMESTAMP(NANOS): Spark 4 refuses native read
        #     (PARQUET_TYPE_ILLEGAL); nanosAsLong reads the raw int64,
        #     then ns -> µs truncation matches DuckDB's ns->TIMESTAMP(µs);
        #   - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
        #     TIMESTAMP_NTZ; under the pinned UTC session tz the cast to
        #     TIMESTAMP is an instant-preserving relabel;
        #   - TIMESTAMP(MICROS/MILLIS, adjusted): already LTZ, pass through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    out = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
