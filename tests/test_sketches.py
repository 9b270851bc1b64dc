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


def test_histogram_quantiles_within_one_bin_of_exact(spark):
    import numpy as np

    rng = random.Random(17)
    vals = [rng.gauss(100, 25) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    bw = 5.0
    cells = sketches.histogram_sketch(df, "x", bw)
    got = {
        r.q: r.q_upper
        for r in sketches.histogram_quantiles(cells, (0.5, 0.9, 0.99), bw).collect()
    }
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        # estimate is the q-bin's upper edge: within one bin width above
        # and never below the exact quantile's own bin floor
        assert exact - bw <= got[q] <= exact + bw + 1e-9, (q, got[q], exact)


def test_histogram_merge_equals_single_build(spark):
    a = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    b = spark.createDataFrame([(float(i),) for i in range(50, 200)], "x double")
    kw = dict(value_col="x", bin_width=7.0)
    merged = sketches.cms_merge(  # same union+re-sum contract…
        sketches.histogram_sketch(a, **kw).withColumnsRenamed({"bin": "bucket"}).withColumn("row_i", F.lit(0)),
        sketches.histogram_sketch(b, **kw).withColumnsRenamed({"bin": "bucket"}).withColumn("row_i", F.lit(0)),
    )
    single = sketches.histogram_sketch(
        a.unionByName(b), **kw
    )
    m = {r.bucket: r.cnt for r in merged.collect()}
    s = {r.bin: r.cnt for r in single.collect()}
    assert m == s


def test_histogram_quantile_rank_rule_integer_exact(spark):
    # 10 values 0..9, bin width 1: p50 rank = ceil(0.5·10) = 5 → bin 4
    # (cum hits 5 at bin 4), upper edge 5.0; p99 rank = ceil(9.9) = 10 → bin 9
    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    cells = sketches.histogram_sketch(df, "x", 1.0)
    got = {r.q: r.q_upper for r in sketches.histogram_quantiles(cells, (0.5, 0.99), 1.0).collect()}
    assert got[0.5] == 5.0
    assert got[0.99] == 10.0


def test_bloom_no_false_negatives(spark):
    rng = random.Random(21)
    members = [f"key{i}" for i in range(200)]
    others = [f"other{i}" for i in range(500)]
    bloom = sketches.bloom_build(_tok_df(spark, members).withColumnsRenamed({"token": "k"}), "k")
    probe = _tok_df(spark, members + others).withColumnsRenamed({"token": "k"})
    flagged = {
        r.k for r in sketches.bloom_probe(probe, "k", bloom, carry_cols=("k",)).collect()
    }
    assert set(members) <= flagged  # the decontamination invariant
    # false-positive rate at n=200, m=65536, k=3: ≈ (1-e^{-600/65536})^3 ~ 7e-7
    fp = flagged - set(members)
    assert len(fp) <= 2, fp


def test_bloom_merge_is_union(spark):
    a = _tok_df(spark, ["a", "b"]).withColumnsRenamed({"token": "k"})
    b = _tok_df(spark, ["b", "c"]).withColumnsRenamed({"token": "k"})
    merged = (
        sketches.bloom_build(a, "k")
        .unionByName(sketches.bloom_build(b, "k"))
        .distinct()
    )
    single = sketches.bloom_build(a.unionByName(b), "k")
    assert {r.bit for r in merged.collect()} == {r.bit for r in single.collect()}


def test_bloom_probe_rejects_all_missing_bits(spark):
    bloom = sketches.bloom_build(
        _tok_df(spark, ["present"]).withColumnsRenamed({"token": "k"}), "k"
    )
    out = sketches.bloom_probe(
        _tok_df(spark, ["absent_key_zzz"]).withColumnsRenamed({"token": "k"}),
        "k",
        bloom,
        carry_cols=("k",),
    ).collect()
    assert out == []


def test_bloom_probe_duplicate_rows_survive_with_multiplicity(spark):
    # Regression: duplicate (carry_cols, key) rows used to collapse in the
    # per-key groupBy, making n_hit = 2k != k and silently DROPPING true
    # members — a false negative in a no-false-negatives contract.
    bloom = sketches.bloom_build(
        _tok_df(spark, ["a", "b"]).withColumnsRenamed({"token": "k"}), "k"
    )
    probe = _tok_df(spark, ["a", "a", "b", "zzz_absent"]).withColumnsRenamed(
        {"token": "k"}
    )
    out = [
        r.k
        for r in sketches.bloom_probe(probe, "k", bloom, carry_cols=("k",)).collect()
    ]
    assert sorted(out) == ["a", "a", "b"]  # both 'a' copies survive
