"""functions/urls.py edge cases the synthesized catalog battery can't
reach: userinfo stripping, unparseable strings, all-tracking queries,
single-label hosts, and idempotence of canonicalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions import urls as U


def _canon(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "u string")
    return df.select(U.canonicalize_url(F.col("u")).alias("c")).first().c


def _domain(spark, host: str) -> str:
    df = spark.createDataFrame([(host,)], "h string")
    return df.select(U.registrable_domain(F.col("h")).alias("d")).first().d


def test_canonicalize_core_rules(spark):
    assert _canon(spark, "HTTP://Ex.COM:80/a/b/?utm_source=1&b=2#f") == "http://ex.com/a/b?b=2"
    assert _canon(spark, "https://ex.com:443/") == "https://ex.com"
    # non-default port survives; param order normalized
    assert _canon(spark, "https://ex.com:8443/p?z=1&a=2") == "https://ex.com:8443/p?a=2&z=1"
    # all params tracking → no query at all
    assert _canon(spark, "http://ex.com/p?utm_a=1&gclid=2&fbclid=3") == "http://ex.com/p"


def test_canonicalize_is_idempotent(spark):
    raws = [
        "HTTP://Ex.COM:80/a/b/?utm_source=1&b=2&a=9#f",
        "https://news.Site.co.uk:80/x//?z=1&y=2",
        "http://user:pw@Host.ORG/p",
    ]
    for raw in raws:
        once = _canon(spark, raw)
        assert _canon(spark, once) == once, raw


def test_host_strips_userinfo_and_port(spark):
    df = spark.createDataFrame([("http://user:pw@Host.ORG:8080/p",)], "u string")
    assert df.select(U.url_host(F.col("u")).alias("h")).first().h == "host.org"


def test_unparseable_url_degrades_to_empty_parts(spark):
    # no scheme → the regex doesn't match; every extracted part is ''
    # and the canonical form is the bare '://' skeleton, never a crash
    assert _canon(spark, "not a url") == "://"


def test_registrable_domain_heuristic(spark):
    assert _domain(spark, "news.site.co.uk") == "site.co.uk"
    assert _domain(spark, "a.b.example.com") == "example.com"
    assert _domain(spark, "example.org") == "example.org"
    assert _domain(spark, "localhost") == "localhost"  # single label: unchanged
