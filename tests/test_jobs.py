"""EP1 end-to-end incremental job: bootstrap, incremental merge,
idempotent re-run, watermark-driven skipping."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark import jobs


def _raw(spark, rows):
    return spark.createDataFrame(
        [
            (pid, title, dt.datetime(2024, 1, day, 12), seq)
            for pid, title, day, seq in rows
        ],
        "post_id string, title string, created_datetime timestamp, scrape_seq long",
    )


def test_incremental_job_lifecycle(spark, tmp_path):
    gold = str(tmp_path / "gold")
    now = dt.datetime(2024, 1, 20)

    # run 1 — bootstrap
    r1 = _raw(
        spark,
        [
            ("a", "Hiring Data Engineer $100k - 120k Remote", 15, 1),
            ("b", "Question about pay", 14, 2),          # filtered out
            ("c", "Backend Engineer position Berlin", 15, 3),
        ],
    )
    n1 = jobs.run_incremental(spark, r1, gold, now)
    assert n1 == 2
    # materialize now: the DataFrame handle would go stale after run 2
    # overwrites the partitions underneath it
    g1_rows = spark.read.parquet(gold).collect()
    assert {r.post_id for r in g1_rows} == {"a", "c"}

    # run 2 — same batch again: the watermark (max created = Jan 15 12:00)
    # admits only the boundary rows, which re-merge to identical values —
    # idempotence at the sink
    n2 = jobs.run_incremental(spark, r1, gold, now)
    assert n2 == 2
    g2_rows = spark.read.parquet(gold).collect()
    assert sorted((r.post_id, r.lower_salary) for r in g2_rows) == sorted(
        (r.post_id, r.lower_salary) for r in g1_rows
    )

    # run 3 — new post + update to an old one (rescraped: created_datetime
    # is immutable — creation time — so it stays Jan 15, inside the window)
    r3 = _raw(
        spark,
        [
            ("a", "Hiring Data Engineer $150k - 180k Remote", 15, 4),  # update
            ("d", "We are hiring a QA Engineer", 17, 5),               # new
        ],
    )
    n3 = jobs.run_incremental(spark, r3, gold, dt.datetime(2024, 1, 21))
    assert n3 == 2
    g3 = {r.post_id: r for r in spark.read.parquet(gold).collect()}
    assert set(g3) == {"a", "c", "d"}
    assert g3["a"].lower_salary == 150000.0  # last writer won

    # run 4 — stale data below the watermark: O4 short-circuit, no write
    stale = _raw(spark, [("e", "Hiring ancient role", 1, 6)])
    wm_now = dt.datetime(2024, 1, 21)
    n4 = jobs.run_incremental(spark, stale, gold, wm_now)
    assert n4 == 0
    assert set(r.post_id for r in spark.read.parquet(gold).collect()) == {"a", "c", "d"}


def test_run_with_retries():
    calls = []
    failures = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    out = jobs.run_with_retries(
        flaky, retries=3, delay_s=0, on_failure=lambda a, e: failures.append(a)
    )
    assert out == "ok" and len(calls) == 3 and failures == [0, 1]

    def always_fails():
        raise RuntimeError("permanent")

    import pytest

    with pytest.raises(RuntimeError, match="permanent"):
        jobs.run_with_retries(always_fails, retries=1, delay_s=0)
