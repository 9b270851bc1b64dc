"""Differential tests: the Python UDTF escape hatch must agree row-for-
row with the native Column-expression path (functions/extract.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions import extract, udtfs

TITLES = [
    (1, "Hiring Senior Data Engineer in Berlin $100k - 150k python sql aws"),
    (2, "ML Engineer (Remote) pytorch tensorflow kubernetes"),
    (3, "Looking for advice about c++ and c#"),
    (4, ""),
    (5, None),
    (6, "Machine Learning Engineer New York Analytics django"),
]


def _titles(spark):
    return spark.createDataFrame(TITLES, "id long, title string")


class TestExtractJobDetailsUdtf:
    def test_matches_native_expressions(self, spark):
        df = _titles(spark)
        native = df.select(
            "id",
            extract.job_position("title").alias("job_position"),
            extract.location("title").alias("location"),
            extract.field("title").alias("field"),
            extract.technologies("title").alias("technologies"),
        )
        df.createOrReplaceTempView("titles_udtf_in")
        spark.udtf.register("extract_job_details", udtfs.extract_job_details)
        via_udtf = spark.sql(
            """
            SELECT t.id, d.job_position, d.location, d.field, d.technologies
            FROM titles_udtf_in t,
                 LATERAL extract_job_details(t.title) d
            """
        )
        nat = {r.id: (r.job_position, r.location, r.field, list(r.technologies)) for r in native.collect()}
        got = {r.id: (r.job_position, r.location, r.field, list(r.technologies)) for r in via_udtf.collect()}
        assert got == nat
        assert got[1][0] == "Data Engineer"  # non-vacuous: ladder matched

    def test_empty_title_defaults(self, spark):
        spark.udtf.register("extract_job_details", udtfs.extract_job_details)
        rows = spark.sql(
            "SELECT * FROM extract_job_details(NULL)"
        ).collect()
        assert len(rows) == 1
        assert rows[0].job_position is None and list(rows[0].technologies) == []


class TestTokenizeUdtf:
    def test_matches_posexplode(self, spark):
        df = _titles(spark)
        native = df.select(
            "id", F.posexplode(extract.tokens("title")).alias("pos", "token")
        )
        df.createOrReplaceTempView("titles_tok_in")
        spark.udtf.register("tokenize_udtf", udtfs.tokenize)
        via_udtf = spark.sql(
            "SELECT t.id, u.pos, u.token FROM titles_tok_in t,"
            " LATERAL tokenize_udtf(t.title) u"
        )
        assert sorted(map(tuple, native.collect())) == sorted(
            map(tuple, via_udtf.collect())
        )
