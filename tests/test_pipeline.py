"""Pipeline-level tests: dedup survivor determinism, transform order,
validity filter, merge upsert semantics + idempotence (SURVEY.md §5.3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark import pipeline
from reddit_tech_jobs_data_pipeline_spark.operators import merge as merge_ops


def _raw(spark, rows):
    return spark.createDataFrame(
        rows, "post_id string, title string, scrape_seq long"
    )


class TestDedupFirstSeen:
    def test_keeps_lowest_seq(self, spark):
        df = _raw(
            spark,
            [("a", "t1", 2), ("a", "t1", 1), ("a", "t2", 3), ("b", "t1", 4)],
        )
        out = pipeline.dedup_first_seen(df, ["post_id", "title"], "scrape_seq")
        got = {(r.post_id, r.title, r.scrape_seq) for r in out.collect()}
        assert got == {("a", "t1", 1), ("a", "t2", 3), ("b", "t1", 4)}


class TestTransform:
    def test_end_to_end(self, spark):
        rows = [
            ("p1", "Hiring Data Engineer $120k - 150k Remote python aws", 1),
            ("p1", "Hiring Data Engineer $120k - 150k Remote python aws", 2),  # dup
            ("p2", "Question about salaries", 3),          # invalid: negative kw
            ("p3", "90k - 120k contract", 4),              # no job kw but salary => valid
            ("p4", "random chatter", 5),                   # invalid
        ]
        out = pipeline.transform(_raw(spark, rows)).orderBy("post_id").collect()
        assert [r.post_id for r in out] == ["p1", "p3"]
        r1 = out[0]
        assert r1.salary_currency == "$"
        assert r1.lower_salary == 120000.0 and r1.upper_salary == 150000.0
        assert r1.job_position == "Data Engineer"
        assert r1.location == "Remote"
        # 'Data Engineer' != field term 'Data Engineering' — no field match
        assert r1.field is None
        assert r1.technologies == ["aws", "python"]
        r3 = out[1]
        assert r3.salary_currency == "None"  # sentinel string, not NULL


class TestMergeUpsert:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [("a", 1.0, 1), ("b", 2.0, 1)], "k string, v double, version int"
        )
        new = spark.createDataFrame(
            [("b", 20.0, 2), ("c", 3.0, 2)], "k string, v double, version int"
        )
        return old, new

    def test_last_writer_wins(self, spark):
        old, new = self._frames(spark)
        out = merge_ops.merge_upsert(old, new, ["k"], "version")
        got = {(r.k, r.v) for r in out.collect()}
        assert got == {("a", 1.0), ("b", 20.0), ("c", 3.0)}

    def test_idempotent(self, spark):
        # merging the same batch twice ≡ once (ON CONFLICT DO UPDATE analog)
        old, new = self._frames(spark)
        once = merge_ops.merge_upsert(old, new, ["k"], "version")
        twice = merge_ops.merge_upsert(once, new, ["k"], "version")
        assert {tuple(r) for r in twice.collect()} == {tuple(r) for r in once.collect()}

    def test_equal_version_prefers_incoming(self, spark):
        old = spark.createDataFrame([("a", 1.0, 1)], "k string, v double, version int")
        new = spark.createDataFrame([("a", 9.0, 1)], "k string, v double, version int")
        out = merge_ops.merge_upsert(old, new, ["k"], "version")
        assert out.first().v == 9.0


class TestWatermark:
    def test_max_within_lookback(self, spark):
        now = dt.datetime(2024, 2, 1)
        sink = spark.createDataFrame(
            [(dt.datetime(2024, 1, 20),), (dt.datetime(2023, 11, 1),)], "ts timestamp"
        )
        wm = merge_ops.watermark_lower_bound(sink, "ts", now=now, lookback_days=30)
        assert wm == dt.datetime(2024, 1, 20)

    def test_fallback_on_empty(self, spark):
        now = dt.datetime(2024, 2, 1)
        sink = spark.createDataFrame([], "ts timestamp")
        wm = merge_ops.watermark_lower_bound(sink, "ts", now=now, fallback_days=7)
        assert wm == dt.datetime(2024, 1, 25)
