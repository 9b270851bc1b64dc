"""Water-filling mixture allocation (operators/mixture.py) against
hand-computed fixtures and its invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import mixture


def _alloc(spark, rows, budget):
    totals = spark.createDataFrame(
        rows, "source string, avail long, w long"
    ).withColumn("budget", F.lit(budget).cast("long"))
    return {
        r.source: r.alloc
        for r in mixture.waterfill_threshold(totals, "budget").collect()
    }


def test_waterfill_hand_computed(spark):
    # sources: a (avail 100, w 1), b (avail 1000, w 1), c (avail 1000, w 2)
    # budget 700: a caps at 100 (ratio 100); remaining 600 over w=3 → t=200;
    # b gets 200, c gets 400 — none further capped (200 < 1000, 400 < 1000)
    got = _alloc(spark, [("a", 100, 1), ("b", 1000, 1), ("c", 1000, 2)], 700)
    assert got == {"a": 100, "b": 200, "c": 400}


def test_waterfill_budget_exceeds_inventory(spark):
    got = _alloc(spark, [("a", 10, 1), ("b", 20, 3)], 1000)
    assert got == {"a": 10, "b": 20}  # everything capped


def test_waterfill_no_source_capped(spark):
    # budget 30 over weights 1:2, both have plenty → pure proportional
    got = _alloc(spark, [("a", 1000, 1), ("b", 1000, 2)], 30)
    assert got == {"a": 10, "b": 20}


def test_waterfill_total_never_exceeds_budget(spark):
    rows = [(f"s{i}", (i * 37) % 500 + 50, (i % 4) + 1) for i in range(12)]
    for budget in (100, 1000, 2500, 10**6):
        got = _alloc(spark, rows, budget)
        total_avail = sum(a for _, a, _ in rows)
        assert sum(got.values()) <= min(budget, total_avail)
        # floor slack is bounded by one token per uncapped source
        if budget < total_avail:
            assert sum(got.values()) >= budget - len(rows)


def test_waterfill_k1_single_source(spark):
    assert _alloc(spark, [("a", 500, 3)], 200) == {"a": 200}
    assert _alloc(spark, [("a", 500, 3)], 900) == {"a": 500}  # capped


def test_waterfill_zero_and_negative_weight_sources(spark):
    # w ≤ 0 (and null w) sources get alloc 0 and do NOT absorb budget
    got = _alloc(
        spark,
        [("a", 1000, 1), ("z", 1000, 0), ("n", 1000, -2), ("b", 1000, 2)],
        30,
    )
    assert got == {"a": 10, "b": 20, "z": 0, "n": 0}


def test_waterfill_null_weight_rows_survive_with_zero_alloc(spark):
    totals = spark.createDataFrame(
        [("a", 1000, 1), ("x", 1000, None)], "source string, avail long, w long"
    ).withColumn("budget", F.lit(30).cast("long"))
    got = {
        r.source: r.alloc
        for r in mixture.waterfill_threshold(totals, "budget").collect()
    }
    assert got == {"a": 30, "x": 0}


def test_waterfill_nonpositive_budget_clamps_to_zero(spark):
    for budget in (0, -50):
        got = _alloc(spark, [("a", 100, 1), ("b", 100, 2)], budget)
        assert got == {"a": 0, "b": 0}


def test_waterfill_10k_sources_invariants(spark):
    """The K-row window license at realistic K: 10k sources, invariants
    Σalloc ≤ min(budget, Σavail), caps respected, floor slack ≤ K."""
    rows = [
        (f"s{i}", (i * 7919) % 10_000 + 1, (i % 5) + 1) for i in range(10_000)
    ]
    total_avail = sum(a for _, a, _ in rows)
    budget = total_avail // 3
    got = _alloc(spark, rows, budget)
    assert len(got) == 10_000
    avail = {s: a for s, a, _ in rows}
    assert all(0 <= got[s] <= avail[s] for s in got)
    assert sum(got.values()) <= budget
    assert sum(got.values()) >= budget - len(rows)  # floor slack bound


def test_mixture_select_respects_allocations(spark):
    docs = spark.createDataFrame(
        [("a", i, 10) for i in range(10)] + [("b", i, 10) for i in range(10)],
        "source string, doc_id long, n_tok long",
    )
    allocs = spark.createDataFrame(
        [("a", 100, 1, 35), ("b", 100, 1, 0)],
        "source string, avail long, w long, alloc long",
    )
    out = {r.source: r for r in mixture.mixture_select(docs, allocs).collect()}
    assert out["a"].n_docs_sel == 3 and out["a"].tokens_sel == 30  # 3×10 ≤ 35
    assert out["b"].n_docs_sel == 0 and out["b"].tokens_sel == 0


def _temp(spark, masses, alpha):
    per = spark.createDataFrame(
        [(f"s{i}", m) for i, m in enumerate(masses)],
        "source string, total_tokens long",
    )
    return {
        r.source: r
        for r in mixture.temperature_weights(per, "total_tokens", alpha).collect()
    }


def test_temperature_alpha_one_is_natural(spark):
    got = _temp(spark, [100, 300, 600], alpha=1.0)
    for r in got.values():
        assert abs(r.p_temperature - r.natural_share) < 1e-12
        assert abs(r.upsample_factor - 1.0) < 1e-12


def test_temperature_alpha_zero_is_uniform(spark):
    got = _temp(spark, [1, 10, 100, 1000], alpha=0.0)
    for r in got.values():
        assert abs(r.p_temperature - 0.25) < 1e-12


def test_temperature_flattens_monotonically(spark):
    # 0 < alpha < 1: p still increases with mass, but upsample_factor
    # strictly decreases — low-resource sources get multiplied up,
    # heads down, and the probabilities sum to 1
    masses = [10, 100, 1000, 10000]
    got = _temp(spark, masses, alpha=0.3)
    rows = [got[f"s{i}"] for i in range(len(masses))]
    assert abs(sum(r.p_temperature for r in rows) - 1.0) < 1e-12
    for lo, hi in zip(rows, rows[1:]):
        assert hi.p_temperature > lo.p_temperature
        assert hi.upsample_factor < lo.upsample_factor
    assert rows[0].upsample_factor > 1.0 > rows[-1].upsample_factor


def test_temperature_zero_mass_source(spark):
    got = _temp(spark, [0, 50, 50], alpha=0.3)
    assert got["s0"].p_temperature == 0.0
    assert got["s0"].upsample_factor is None
    assert abs(got["s1"].p_temperature - 0.5) < 1e-12


def _realized(spark, factors, n=200, seed="t"):
    # factors: dict source -> factor; docs round-robin across sources
    srcs = list(factors)
    docs = spark.createDataFrame(
        [(i, srcs[i % len(srcs)], float(factors[srcs[i % len(srcs)]])) for i in range(n)],
        "doc_id long, source string, factor double",
    )
    return mixture.realize_repeats(docs, "factor", "doc_id", seed=seed)


def test_realize_integer_factor_is_exact(spark):
    out = _realized(spark, {"a": 2.0}, n=50)
    per = out.groupBy("doc_id").count().collect()
    assert len(per) == 50 and all(r["count"] == 2 for r in per)
    # copy_idx enumerates 1..n_copies
    idx = sorted(r.copy_idx for r in out.filter(F.col("doc_id") == 0).collect())
    assert idx == [1, 2]


def test_realize_zero_factor_drops_everything(spark):
    assert _realized(spark, {"a": 0.0}, n=40).count() == 0


def test_realize_fractional_factor_concentrates(spark):
    # E[copies] = 1.5 per doc over 2000 docs: sd = sqrt(2000*0.25) ≈ 22
    out = _realized(spark, {"a": 1.5}, n=2000)
    total = out.count()
    assert abs(total - 3000) < 5 * 22
    per = {r.doc_id: r["count"] for r in out.groupBy("doc_id").count().collect()}
    assert set(per.values()) <= {1, 2}
    assert len(per) == 2000  # floor(1.5) = 1 guarantees every doc survives


def test_realize_downsample_bernoulli(spark):
    # factor 0.25 over 2000 docs: keep ≈ 500, sd ≈ 19
    out = _realized(spark, {"a": 0.25}, n=2000)
    kept = out.count()
    assert abs(kept - 500) < 5 * 19
    assert out.filter(F.col("copy_idx") != 1).count() == 0


def test_realize_is_partitioning_invariant_and_epoch_keyed(spark):
    docs = _realized(spark, {"a": 1.3, "b": 0.7}, n=300)
    again = _realized(spark, {"a": 1.3, "b": 0.7}, n=300)
    assert sorted(map(tuple, docs.collect())) == sorted(map(tuple, again.collect()))
    other_seed = _realized(spark, {"a": 1.3, "b": 0.7}, n=300, seed="u")
    assert sorted(map(tuple, docs.collect())) != sorted(
        map(tuple, other_seed.collect())
    )
