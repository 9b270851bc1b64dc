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
