"""MMR diverse top-k (operators/similarity.mmr_topk): diversity beats
plain top-k on clustered data, lambda extremes, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import similarity


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _clustered(spark):
    # query [1,0,0,0]; a tight clump near it + one distinct direction
    vecs = [
        [1.0, 0.0, 0.0, 0.0],      # 0: query
        [0.99, 0.1, 0.0, 0.0],     # 1: clump
        [0.98, 0.11, 0.0, 0.0],    # 2: clump (near-dup of 1)
        [0.97, 0.12, 0.0, 0.0],    # 3: clump (near-dup of 1)
        [0.6, 0.0, 0.8, 0.0],      # 4: distinct direction, lower rel
    ]
    return _df(spark, vecs)


def test_mmr_prefers_diverse_over_near_duplicate(spark):
    df = _clustered(spark)
    out = {r.rank: r.vec_id for r in similarity.mmr_topk(df, k=2, lam=0.5).collect()}
    assert out[1] == 1  # highest relevance first
    # plain top-2 would take vec 2 (next near-dup); MMR takes the
    # distinct direction instead
    assert out[2] == 4


def test_lambda_one_reduces_to_plain_topk(spark):
    df = _clustered(spark)
    out = [r.vec_id for r in similarity.mmr_topk(df, k=3, lam=1.0).collect()]
    exact = [
        r.neighbor_id
        for r in similarity.brute_force_topk(
            df, df.filter(F.col("vec_id") == 0), k=3
        ).collect()
    ]
    assert out == exact  # no diversity term → pure relevance order


def test_deterministic_and_partition_invariant(spark):
    vecs = [[((i * 37 + j * 13) % 100) / 50.0 - 1.0 for j in range(8)] for i in range(40)]
    df = _df(spark, vecs)
    a = [tuple(r) for r in similarity.mmr_topk(df, k=4).collect()]
    b = [tuple(r) for r in similarity.mmr_topk(df.repartition(7), k=4).collect()]
    assert a == b
    assert len({r[1] for r in a}) == 4  # k distinct selections


def test_missing_query_raises_value_error(spark):
    import pytest

    df = _clustered(spark)
    with pytest.raises(ValueError, match="query_id=99"):
        similarity.mmr_topk(df, query_id=99, k=2)


def test_k_beyond_pool_stops_at_candidate_count(spark):
    df = _clustered(spark)  # 4 candidates besides the query
    out = similarity.mmr_topk(df, k=10).collect()
    assert len(out) == 4
    assert [r.rank for r in out] == [1, 2, 3, 4]
