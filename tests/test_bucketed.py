"""Bucketed co-located join: assert the physical plan has no shuffle
Exchange on either join side (the 100 TB fact⋈fact strategy)."""

from __future__ import annotations

import pytest

from reddit_tech_jobs_data_pipeline_spark.sources import bucketed, testdata


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = testdata.load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = testdata.load_table(spark, "/root/testdata/sf0.001", "lineitem")
    bucketed.write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    bucketed.write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force a non-broadcast join: at real scale neither fact side fits the
    # broadcast threshold — that regime is what bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.colocated_join(
            spark, "lineitem_b", "orders_b", "l_orderkey", "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it computes the right thing
    n = joined.count()
    li = testdata.load_table(spark, "/root/testdata/sf0.001", "lineitem")
    assert n == li.count()  # every lineitem matches exactly one order
