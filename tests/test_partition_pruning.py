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


def test_runtime_bloom_filter_injected_for_selective_join(spark):
    """Runtime bloom-filter join pruning: with a selective predicate on
    the creation side, Spark injects a bloom semi-filter
    (might_contain) into the probe-side scan, so fact rows that cannot
    join die at the scan instead of crossing the shuffle. At 100 TB this
    fires out of the box (the probe side clears the 10 GB
    applicationSideScanSizeThreshold); locally we shrink the thresholds
    to put sf0.01 in the same regime, assert the plan shape, and check
    the filtered join is semantics-preserving."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = testdata.load_table(spark, "/root/testdata/sf0.01", "lineitem")
        orders = testdata.load_table(spark, "/root/testdata/sf0.01", "orders").filter(
            "o_totalprice > 400000"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
        assert "might_contain" in plan, plan
        n_bloom = j.count()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n_bloom == plain


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
