"""Targeted deletion (sink.purge_keys): right-to-erasure on the gold
table, rewriting only the partitions that contain a purged key."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.sources import sink
from tests.test_sources import sink_schema


def _posts(spark, day, n=3):
    return spark.createDataFrame(
        [
            (
                f"t3_{day}_{i}", "title", None, None, "a", "r",
                dt.datetime(2024, 1, day, 12), 1, 0, None, 100.0, None,
                None, None, None, [], dt.datetime(2024, 2, 1),
            )
            for i in range(n)
        ],
        sink_schema(),
    )


def test_purge_removes_keys_and_leaves_other_partitions_untouched(spark, tmp_path):
    path = str(tmp_path / "gold")
    sink.write_gold(_posts(spark, 1).unionByName(_posts(spark, 2)), path)
    mtime_day2 = os.path.getmtime(os.path.join(path, "created_date=2024-01-02"))

    keys = spark.createDataFrame([("t3_1_0",), ("t3_1_2",)], "post_id string")
    removed = sink.purge_keys(spark, path, keys)
    assert removed == 2

    out = spark.read.parquet(path)
    assert out.count() == 4
    left = {r.post_id for r in out.select("post_id").collect()}
    assert left == {"t3_1_1", "t3_2_0", "t3_2_1", "t3_2_2"}
    # day-2 partition files untouched on disk
    assert os.path.getmtime(os.path.join(path, "created_date=2024-01-02")) == mtime_day2


def test_purge_missing_keys_is_noop(spark, tmp_path):
    path = str(tmp_path / "gold")
    sink.write_gold(_posts(spark, 1), path)
    mtime = os.path.getmtime(os.path.join(path, "created_date=2024-01-01"))
    keys = spark.createDataFrame([("nope",)], "post_id string")
    assert sink.purge_keys(spark, path, keys) == 0
    assert spark.read.parquet(path).count() == 3
    assert os.path.getmtime(os.path.join(path, "created_date=2024-01-01")) == mtime


def test_purge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "gold")
    sink.write_gold(_posts(spark, 1), path)
    keys = spark.createDataFrame([("t3_1_1",)], "post_id string")
    assert sink.purge_keys(spark, path, keys) == 1
    assert sink.purge_keys(spark, path, keys) == 0
    assert spark.read.parquet(path).count() == 2
