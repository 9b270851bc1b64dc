"""Leakage-safe split (operators/dedup.leakage_safe_split): the
cluster-aware split's defining invariants, independent of the catalog
oracle — (1) no near-dup pair ever crosses a split boundary, (2) the
assignment is deterministic across invocations, (3) singletons split
like 1-element clusters, (4) bucket shares roughly follow the 80/10/10
weights on hash-uniform groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import dedup


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _docs(spark, n):
    return spark.range(n).select(F.col("id"))


def test_no_pair_crosses_split(spark):
    # two chains + a triangle; chain CC spans multiple hops
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)]
    docs = _docs(spark, 30)
    out = dedup.leakage_safe_split(docs, _pairs(spark, edges))
    split_of = {r.id: r.split for r in out.collect()}
    for a, b in edges:
        assert split_of[a] == split_of[b], (a, b)


def test_cluster_members_share_group_and_split(spark):
    edges = [(0, 1), (1, 2), (5, 6)]
    out = dedup.leakage_safe_split(_docs(spark, 8), _pairs(spark, edges))
    rows = {r.id: (r.group_id, r.split) for r in out.collect()}
    assert rows[0] == rows[1] == rows[2]
    assert rows[5] == rows[6]
    assert rows[0][0] == 0 and rows[5][0] == 5  # group = component min
    # singletons group as themselves
    assert rows[3][0] == 3 and rows[4][0] == 4 and rows[7][0] == 7


def test_deterministic_across_invocations(spark):
    edges = [(i, i + 1) for i in range(0, 40, 4)]
    a = sorted(tuple(r) for r in dedup.leakage_safe_split(
        _docs(spark, 50), _pairs(spark, edges)
    ).collect())
    b = sorted(tuple(r) for r in dedup.leakage_safe_split(
        _docs(spark, 50), _pairs(spark, edges)
    ).collect())
    assert a == b and len(a) == 50


def test_bucket_shares_follow_weights(spark):
    # 2000 singleton groups: md5-uniform buckets → shares near 80/10/10
    out = dedup.leakage_safe_split(
        _docs(spark, 2000), _pairs(spark, [(0, 1)])
    )
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert 0.05 < counts["val"] / 2000 < 0.16
    assert 0.05 < counts["test"] / 2000 < 0.16
