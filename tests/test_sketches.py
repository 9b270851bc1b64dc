"""Count-Min sketch (operators/sketches.py): one-sided error, ε-bound,
merge associativity, and the weighted-build ≡ per-occurrence-build
identity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import sketches


def _tok_df(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "token string")


def test_never_undercounts_and_eps_bound(spark):
    rng = random.Random(9)
    # zipf-ish: token w0 hot, long tail
    tokens = []
    for i in range(200):
        tokens += [f"w{i}"] * max(1, 400 // (i + 1))
    rng.shuffle(tokens)
    df = _tok_df(spark, tokens)
    width, depth = 256, 4
    sketch = sketches.cms_build(df, width=width, depth=depth)
    exact = {r.token: r.n for r in df.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {
        r.token: r.est_n
        for r in sketches.cms_estimate(
            _tok_df(spark, list(exact)), sketch, width=width, depth=depth
        ).collect()
    }
    n_total = len(tokens)
    for t, n in exact.items():
        assert est[t] >= n, t  # CMS never undercounts
        # classic bound: overcount ≤ (e/width)·N w.h.p.; allow 4× slack
        assert est[t] - n <= 4 * (2.72 * n_total / width) + 1, (t, est[t], n)


def test_unseen_token_estimates_zero_or_collision(spark):
    df = _tok_df(spark, ["a", "b", "c"] * 5)
    sketch = sketches.cms_build(df, width=1024, depth=4)
    est = {
        r.token: r.est_n
        for r in sketches.cms_estimate(
            _tok_df(spark, ["zzz_unseen"]), sketch
        ).collect()
    }
    # with 3 tokens in 1024 buckets × 4 rows, a 4-row full collision is
    # essentially impossible — the min cell is empty
    assert est["zzz_unseen"] == 0


def test_merge_equals_single_build(spark):
    rng = random.Random(2)
    toks_a = [f"t{rng.randint(0, 50)}" for _ in range(300)]
    toks_b = [f"t{rng.randint(20, 80)}" for _ in range(300)]
    kw = dict(width=128, depth=4)
    merged = sketches.cms_merge(
        sketches.cms_build(_tok_df(spark, toks_a), **kw),
        sketches.cms_build(_tok_df(spark, toks_b), **kw),
    )
    single = sketches.cms_build(_tok_df(spark, toks_a + toks_b), **kw)
    m = {(r.row_i, r.bucket): r.cnt for r in merged.collect()}
    s = {(r.row_i, r.bucket): r.cnt for r in single.collect()}
    assert m == s


def test_weighted_build_equals_occurrence_build(spark):
    toks = ["x"] * 7 + ["y"] * 3 + ["z"]
    occ = sketches.cms_build(_tok_df(spark, toks), width=64, depth=3)
    weighted = sketches.cms_build(
        spark.createDataFrame([("x", 7), ("y", 3), ("z", 1)], "token string, n long"),
        weight_col="n",
        width=64,
        depth=3,
    )
    o = {(r.row_i, r.bucket): r.cnt for r in occ.collect()}
    w = {(r.row_i, r.bucket): r.cnt for r in weighted.collect()}
    assert o == w
