"""Distributed global rank / ntile: scale mode must equal the global
window exactly, with no single-partition Exchange in the plan."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import ranking


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v double")


def _ranks(df):
    return {r["k"]: r["i"] for r in df.collect()}


def test_scale_rank_matches_window(spark):
    rng = random.Random(11)
    # heavy ties in v — the tiebreaker column k must resolve them
    rows = [(i, float(rng.randint(0, 30))) for i in range(1500)]
    df = _mk(spark, rows)
    order = [F.col("v").desc(), F.col("k")]
    a = _ranks(ranking.global_row_number(df, order, scale=False))
    b = _ranks(ranking.global_row_number(df, order, scale=True, num_partitions=7))
    assert a == b
    assert sorted(a.values()) == list(range(1, 1501))


def test_scale_rank_partition_invariance(spark):
    rows = [(i, float(i % 13)) for i in range(400)]
    df = _mk(spark, rows)
    order = [F.col("v"), F.col("k")]
    base = _ranks(ranking.global_row_number(df, order, scale=False))
    for n in (1, 3, 16):
        got = _ranks(
            ranking.global_row_number(df, order, scale=True, num_partitions=n)
        )
        assert got == base, f"rank changed at num_partitions={n}"


def test_ntile_from_rank_matches_sql_ntile(spark):
    # n=25, buckets=10 → first 5 tiles of 3, last 5 of 2; also check
    # n < buckets (every row its own tile) and n % buckets == 0
    for n_rows, buckets in ((25, 10), (7, 10), (30, 10), (1, 4)):
        df = spark.createDataFrame(
            [(i,) for i in range(1, n_rows + 1)], "k long"
        )
        expect = {
            r["k"]: r["t"]
            for r in df.select(
                "k",
                F.ntile(buckets).over(Window.orderBy("k")).cast("long").alias("t"),
            ).collect()
        }
        got = {
            r["k"]: r["t"]
            for r in df.select(
                "k",
                ranking.ntile_from_rank(
                    F.col("k"), F.lit(n_rows).cast("long"), buckets
                ).alias("t"),
            ).collect()
        }
        assert got == expect, (n_rows, buckets)


def test_scale_plan_has_no_single_partition_exchange(spark):
    df = _mk(spark, [(i, float(i)) for i in range(50)])
    out = ranking.global_row_number(
        df, [F.col("v"), F.col("k")], scale=True, num_partitions=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
