"""Token-budget packing: the scale-mode two-phase prefix sum must
produce IDENTICAL shard assignments to the global-window oracle twin,
and its physical plan must contain no single-partition Exchange."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import packing


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def _assign(df):
    return {r["doc_id"]: r["shard_id"] for r in df.collect()}


def test_scale_matches_window_random(spark):
    rng = random.Random(42)
    rows = [(i, rng.randint(1, 900)) for i in range(2000)]
    rng.shuffle(rows)  # arbitrary input order; order_col defines packing order
    df = _mk(spark, rows)
    a = _assign(packing.pack_token_budget(df, "doc_id", "n_tok", 512, scale=False))
    b = _assign(
        packing.pack_token_budget(
            df, "doc_id", "n_tok", 512, scale=True, num_partitions=7
        )
    )
    assert a == b
    # shards are contiguous in doc_id order and start at 0
    assert min(a.values()) == 0
    ordered = [a[k] for k in sorted(a)]
    assert all(x <= y for x, y in zip(ordered, ordered[1:]))


def test_scale_matches_window_adversarial(spark):
    # single giant doc spanning many budgets, zero-adjacent sizes, ids with
    # gaps — exercises floor boundaries and empty-range partitions
    rows = [(1, 10), (2, 5000), (3, 1), (4, 1), (100, 512), (101, 511), (9999, 7)]
    df = _mk(spark, rows)
    a = _assign(packing.pack_token_budget(df, "doc_id", "n_tok", 512, scale=False))
    b = _assign(
        packing.pack_token_budget(
            df, "doc_id", "n_tok", 512, scale=True, num_partitions=16
        )
    )
    assert a == b


def test_partition_count_invariance(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(1, 300)) for i in range(500)]
    df = _mk(spark, rows)
    base = _assign(packing.pack_token_budget(df, "doc_id", "n_tok", 256, scale=True))
    for n in (1, 3, 13):
        got = _assign(
            packing.pack_token_budget(
                df, "doc_id", "n_tok", 256, scale=True, num_partitions=n
            )
        )
        assert got == base, f"assignment changed at num_partitions={n}"


def test_scale_plan_has_no_single_partition_exchange(spark):
    rows = [(i, 10) for i in range(100)]
    df = _mk(spark, rows)
    out = packing.pack_token_budget(
        df, "doc_id", "n_tok", 64, scale=True, num_partitions=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # the windowed mode, by contrast, IS the single-partition shape
    win = packing.pack_token_budget(df, "doc_id", "n_tok", 64, scale=False)
    wplan = win._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in wplan


def test_shard_summary_totals(spark):
    rows = [(i, 100) for i in range(10)]
    df = _mk(spark, rows)
    packed = packing.pack_token_budget(df, "doc_id", "n_tok", 250, scale=True)
    got = {
        r["shard_id"]: (r["n_docs"], r["shard_tokens"])
        for r in packing.shard_summary(packed, "n_tok").collect()
    }
    # offsets 0..900 step 100 → floor(offset/250): shards 0,0,0,1,1,2,2,2,3,3
    assert got == {0: (3, 300), 1: (2, 200), 2: (3, 300), 3: (2, 200)}


def test_length_bucket_batches_integer_exact(spark):
    from reddit_tech_jobs_data_pipeline_spark.operators.packing import (
        length_bucket_batches,
    )

    rows = [(i, n) for i, n in enumerate([1, 2, 3, 4, 5, 8, 9, 16, 17, 31, 32, 33])]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = {
        (r.bucket, r.batch): r
        for r in length_bucket_batches(df, "n_tok", "doc_id", batch_size=2).collect()
    }
    # power-of-two buckets: smallest 2^k >= len
    assert set(b for b, _ in out) == {1, 2, 4, 8, 16, 32, 64}
    # bucket 4 holds lens 3,4 → one batch, pad = 2*4 - 7 = 1
    r = out[(4, 0)]
    assert (r.n_docs, r.max_len, r.real_tokens, r.pad_tokens) == (2, 4, 7, 1)
    # bucket 32 holds 17,31,32 → batches [17,31],[32]; pads 14 and 0
    assert (out[(32, 0)].pad_tokens, out[(32, 1)].pad_tokens) == (14, 0)
    # padding never negative, and zero for singleton batches
    assert all(r.pad_tokens >= 0 for r in out.values())


def test_length_bucket_drops_nonpositive_lengths(spark):
    from reddit_tech_jobs_data_pipeline_spark.operators.packing import (
        length_bucket_batches,
    )

    rows = [(0, 0), (1, -3), (2, 4), (3, 4)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = length_bucket_batches(df, "n_tok", "doc_id", batch_size=2).collect()
    # the two nonpositive rows are dropped, not pooled under a NULL bucket
    assert len(out) == 1
    assert (out[0].bucket, out[0].n_docs) == (4, 2)
    assert all(r.bucket is not None for r in out)
