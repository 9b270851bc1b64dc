"""Partition pruning on the date/type-partitioned lake layout.

Two claims a 100 TB reader depends on, plan-asserted here:

* STATIC pruning — a literal predicate on the partition column reaches
  the scan as a PartitionFilter (no data files outside the partition are
  listed, let alone read).
* DYNAMIC partition pruning (DPP) — when the selective predicate lives
  on a joined dimension, Spark injects a runtime subquery filter on the
  fact's partition column, so the fact scan still reads only the
  matching partitions. This is what keeps dim-filtered joins against a
  petabyte fact table proportional to the selected slice.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.sources import testdata


@pytest.fixture(scope="module")
def typed_events_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ev_by_type") / "events")
    ev = testdata.load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.partitionBy("event_type").parquet(path)
    return path


def test_static_partition_pruning_reaches_scan(spark, typed_events_path):
    df = spark.read.parquet(typed_events_path).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the predicate must appear among PartitionFilters, not (only) as a
    # post-scan Filter on data columns
    pf = plan[plan.index("PartitionFilters") :].split("]", 1)[0]
    assert "event_type" in pf, plan


def test_dynamic_partition_pruning_from_dim_filter(spark, typed_events_path):
    fact = spark.read.parquet(typed_events_path)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 0), ("purchase", 0), ("error", 0), ("login", 0)],
        "event_type string, is_conversion int",
    )
    joined = fact.join(F.broadcast(dim.filter("is_conversion = 1")), "event_type")
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, plan
    # and the pruned read returns exactly the click slice
    n_click = fact.filter("event_type = 'click'").count()
    assert joined.count() == n_click
