"""Round-11 stats batch: semantics the oracle fixtures can't isolate —
known-answer checks against pure-python/closed-form results on crafted
series, and edge cases (perfect monotonicity, ties, out-of-order
arrival)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_spearman_perfect_monotone_is_one(spark):
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_stats2 import (
        spearman_corr_by_type,
    )

    # build a fixture where value increases strictly with hour: rho = 1
    rows = [
        (i, f"2024-01-01 {h:02d}:00:00", 1, "click", float(h * 10), "{}")
        for i, h in enumerate(range(24))
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile

    d = tempfile.mkdtemp(prefix="stats2_fix_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.event_type: r.spearman_rho for r in spearman_corr_by_type(spark, d).collect()}
    assert out["click"] == 1.0


def test_kendall_tau_known_answer(spark, tmp_path):
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_stats2 import (
        kendall_tau_daily,
    )

    # 4 days: revenue [10, 20, 15, 30] (as single orders), counts all 1
    # (all dy = 0 -> every pair ties on y -> tau_b denominator (n0-Ty)=0
    # would be degenerate), so give day 2 two orders: counts [1,2,1,1].
    rows = [
        (1, 1, "O", 10.0, "2024-01-01", "P"),
        (2, 1, "O", 12.0, "2024-01-02", "P"),
        (3, 1, "O", 8.0, "2024-01-02", "P"),
        (4, 1, "O", 15.0, "2024-01-03", "P"),
        (5, 1, "O", 30.0, "2024-01-04", "P"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    r = kendall_tau_daily(spark, d).first()
    # daily: rev [10, 20, 15, 30], cnt [1, 2, 1, 1]
    # pairs (i<j): dx sign / dy sign:
    # (1,2): +/+ C; (1,3): +/0 tie_y; (1,4): +/0 tie_y
    # (2,3): -/- C; (2,4): +/- D
    # (3,4): +/0 tie_y
    # C=2, D=1, n0=6, Tx=0, Ty=3 -> tau_b=(2-1)/sqrt(6*3)=0.2357
    assert (r.n0, r.conc, r.disc) == (6, 2, 1)
    assert abs(r.tau_b - round(1 / math.sqrt(18), 4)) < 1e-9


def test_holt_winters_matches_pure_python(spark, tmp_path):
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_stats2 import (
        holt_winters_daily,
    )

    xs = [100.0, 110.0, 105.0, 120.0, 130.0, 125.0, 140.0]
    rows = [
        (i + 1, 1, "O", xs[i], f"2024-01-{i+1:02d}", "P") for i in range(len(xs))
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    got = {r.t: (r.level, r.trend) for r in holt_winters_daily(spark, d).collect()}

    def r4(x):
        # Spark/DuckDB round() is HALF_UP on the decimal repr; python's
        # round() is banker's — emulate the engines' behavior
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    l, b = xs[0], xs[1] - xs[0]
    want = {1: (r4(l), r4(b))}
    for i in range(1, len(xs)):
        l_new = 0.5 * xs[i] + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
        want[i + 1] = (r4(l), r4(b))
    assert got == want


def test_late_arrival_buckets(spark, tmp_path):
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_stats2 import (
        late_arrival_audit,
    )

    # single shard (user 0): arrival order = event_id; ts sequence puts
    # one event 30s late, one 11min late, rest in order
    rows = [
        (1, "2024-01-01 00:10:00", 0, "click", 1.0, "{}"),
        (2, "2024-01-01 00:20:00", 0, "click", 1.0, "{}"),
        (3, "2024-01-01 00:19:30", 0, "click", 1.0, "{}"),  # 30s late
        (4, "2024-01-01 00:30:00", 0, "click", 1.0, "{}"),
        (5, "2024-01-01 00:19:00", 0, "click", 1.0, "{}"),  # 11min late
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = late_arrival_audit(spark, d).first()
    assert r.n_events == 5
    assert r.in_order == 3
    assert r.late_le_60s == 1
    assert r.late_le_600s == 0
    assert r.dropped_by_10m_watermark == 1
