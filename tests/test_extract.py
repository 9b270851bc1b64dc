"""Unit tests for the enrichment expression library against the FAITHFUL
reference vocabulary (dags/dag.py semantics — see SURVEY.md §2.2/§2.3).

Corpus rows are chosen to hit every branch the reference's Python code
has: match / no-currency sentinel / no-match / empty / NULL, ladder
priority order, tokenizer punctuation loss, negative-keyword short-circuit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions import extract


def _vals(spark, titles, col):
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    return [r[0] for r in df.select(col.alias("v")).collect()]


class TestSalary:
    def test_full_match_with_currency(self, spark):
        # dag.py:28-37: currency group + bounds ×1000, pattern over lower(title)
        vals = _vals(spark, ["Data Engineer $120k - 150k remote"], extract.salary_currency("title"))
        assert vals == ["$"]
        lo = _vals(spark, ["Data Engineer $120k - 150k remote"], extract.salary_bound("title", "lower"))
        hi = _vals(spark, ["Data Engineer $120k - 150k remote"], extract.salary_bound("title", "upper"))
        assert lo == [120000.0] and hi == [150000.0]

    def test_no_currency_yields_string_none_sentinel(self, spark):
        # dag.py:32 — the literal string 'None', not SQL NULL.
        # NB a preceding word IS captured as "currency" by the reference
        # pattern ([A-Za-z$€£]* is greedy): 'salary: 90k-110k' has ':' before
        # the digits, so the currency group is empty -> sentinel.
        assert _vals(spark, ["salary: 90k - 110k"], extract.salary_currency("title")) == ["None"]

    def test_preceding_word_captured_as_currency(self, spark):
        # faithful quirk: 'hiring 90k - 110k' -> currency 'hiring'
        assert _vals(spark, ["hiring 90k - 110k"], extract.salary_currency("title")) == ["hiring"]

    def test_decimal_bounds(self, spark):
        assert _vals(spark, ["role 90.5k-110.25k"], extract.salary_bound("title", "lower")) == [90500.0]

    def test_currency_word(self, spark):
        # [A-Za-z$€£]* also matches currency words like 'usd' (lowered)
        assert _vals(spark, ["x usd 10k - 20k"], extract.salary_currency("title")) == ["usd"]

    def test_no_match_is_null(self, spark):
        assert _vals(spark, ["Senior Data Engineer"], extract.salary_currency("title")) == [None]
        assert _vals(spark, ["Senior Data Engineer"], extract.salary_bound("title", "lower")) == [None]

    def test_null_and_empty_title(self, spark):
        assert _vals(spark, [None, ""], extract.salary_currency("title")) == [None, None]


class TestLadders:
    def test_specific_position_beats_generic(self, spark):
        # 'Data Engineer' contains generic 'Engineer'; specific pattern wins (dag.py:115-119)
        assert _vals(spark, ["Hiring a Data Engineer now"], extract.job_position("title")) == ["Data Engineer"]

    def test_generic_fallback(self, spark):
        assert _vals(spark, ["Hiring a Platform Architect"], extract.job_position("title")) == ["Architect"]

    def test_case_insensitive_preserves_original_case(self, spark):
        # re.IGNORECASE match returns the matched slice, original casing
        assert _vals(spark, ["SENIOR DATA ENGINEER"], extract.job_position("title")) == ["DATA ENGINEER"]

    def test_location_priority_remote_over_city(self, spark):
        # remote-type rung is tried before city rung (dag.py:104-110)
        assert _vals(spark, ["Engineer - Remote (New York)"], extract.location("title")) == ["Remote"]
        assert _vals(spark, ["Engineer in New York"], extract.location("title")) == ["New York"]

    def test_field(self, spark):
        assert _vals(spark, ["ML role: Machine Learning platform"], extract.field("title")) == ["Machine Learning"]
        assert _vals(spark, ["nothing here"], extract.field("title")) == [None]


class TestTechnologies:
    def test_detects_sorted(self, spark):
        vals = _vals(spark, ["Python and Docker and AWS stack"], extract.technologies("title"))
        assert vals == [["aws", "docker", "python"]]

    def test_cpp_and_csharp_unreachable(self, spark):
        # dag.py:139 \w+ tokenizer loses punctuation — faithful quirk (SURVEY §7.4)
        assert _vals(spark, ["C++ and C# developer"], extract.technologies("title")) == [[]]

    def test_go_matches_as_word(self, spark):
        assert _vals(spark, ["we use go in production"], extract.technologies("title")) == [["go"]]

    def test_null_empty_yield_empty_array(self, spark):
        # dag.py:84 — falsy title => empty list, not NULL
        assert _vals(spark, [None, ""], extract.technologies("title")) == [[], []]


class TestIsJobPost:
    def test_positive(self, spark):
        assert _vals(spark, ["We are hiring!"], extract.is_job_post("title")) == [True]

    def test_negative_short_circuits_positive(self, spark):
        # 'question' beats 'job' (dag.py:64-66)
        assert _vals(spark, ["Question about job hunting"], extract.is_job_post("title")) == [False]

    def test_substring_semantics(self, spark):
        # containment, not word-boundary: 'workload' contains 'work'
        assert _vals(spark, ["heavy workload discussion"], extract.is_job_post("title")) == [False]
        assert _vals(spark, ["heavy workload ahead"], extract.is_job_post("title")) == [True]

    def test_dead_negative_keyword(self, spark):
        # 'Looking for Data Engineering job' can never match a lowercased
        # title (capitals) — faithful dead code; 'job' still positive-matches
        assert _vals(spark, ["looking for data engineering job"], extract.is_job_post("title")) == [True]

    def test_null_empty_false(self, spark):
        assert _vals(spark, [None, ""], extract.is_job_post("title")) == [False, False]


class TestScalarParsers:
    def test_parse_leading_int(self, spark):
        rows = ["45 comments", "comment", "  7 comments", "12x junk", None, ""]
        assert _vals(spark, rows, extract.parse_leading_int("title")) == [45, 0, 7, 0, 0, 0]

    def test_ts_from_millis(self, spark):
        df = spark.createDataFrame([(1704067200500,)], "ms long")
        out = df.select(F.date_format(extract.ts_from_millis("ms"), "yyyy-MM-dd HH:mm:ss.SSS").alias("v")).first()[0]
        assert out == "2024-01-01 00:00:00.500"

    def test_ts_to_iso(self, spark):
        df = spark.createDataFrame([(1704067200000,)], "ms long")
        out = df.select(extract.ts_to_iso(extract.ts_from_millis("ms")).alias("v")).first()[0]
        assert out == "2024-01-01T00:00:00Z"
