"""Join-strategy hints: the manual overrides a 100 TB operator needs
when the optimizer's size estimates are wrong (a common failure mode on
fresh tables with no stats). Each hint must actually flip the physical
operator — asserted on the executed plan, not assumed."""

from __future__ import annotations

import pytest

from reddit_tech_jobs_data_pipeline_spark.sources import testdata


@pytest.fixture(scope="module")
def tables(spark):
    li = testdata.load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = testdata.load_table(spark, "/root/testdata/sf0.001", "orders")
    return li, orders


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_hint_forces_bhj(spark, tables):
    li, orders = tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # would never broadcast
    try:
        j = li.join(orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey)
        assert "BroadcastHashJoin" in _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_shuffle_hash_hint_avoids_sort(spark, tables):
    li, orders = tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        p = _plan(j)
        assert "ShuffledHashJoin" in p and "SortMergeJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_merge_hint_forces_smj_over_broadcast(spark, tables):
    li, orders = tables
    # thresholds favor broadcast at this SF; the merge hint must win
    j = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    p = _plan(j)
    assert "SortMergeJoin" in p and "BroadcastHashJoin" not in p


def test_hints_do_not_change_results(spark, tables):
    li, orders = tables
    base = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    for h in ("broadcast", "shuffle_hash", "merge"):
        assert (
            li.join(orders.hint(h), li.l_orderkey == orders.o_orderkey).count() == base
        )


class TestOrcFormat:
    def test_orc_roundtrip_and_pushdown(self, spark, tmp_path):
        """Format breadth beyond parquet: the columnar sink/scan contract
        (schema fidelity, predicate pushdown reaching the scan) holds for
        ORC too — same lake layout code paths, different container."""
        ev = testdata.load_table(spark, "/root/testdata/sf0.001", "events")
        path = str(tmp_path / "events_orc")
        ev.write.orc(path)
        back = spark.read.orc(path)
        assert back.schema == ev.schema
        assert back.count() == ev.count()
        q = back.filter("user_id = 7").select("event_id", "user_id")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters", 1)[1][:200]
        assert q.count() == ev.filter("user_id = 7").count()
