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


def test_registrable_domain_atomic_hosts(spark):
    # bare IPv4 must NOT be label-split (the old last-two-labels path
    # would have produced "0.3"); bracketed IPv6 is atomic too
    assert _domain(spark, "192.168.0.3") == "192.168.0.3"
    assert _domain(spark, "10.0.0.1") == "10.0.0.1"
    assert _domain(spark, "[2001:db8::1]") == "[2001:db8::1]"
    assert _domain(spark, "[::1]") == "[::1]"
    # looks-like-but-isn't IPv4 (label count != 4) still goes through
    # the heuristic
    assert _domain(spark, "1.2.3.4.5") == "4.5"


def test_url_host_ipv6_port_strip(spark):
    df = spark.createDataFrame(
        [("http://[2001:DB8::1]:8080/p",), ("https://[::1]/x",), ("http://[2001:db8::1]/",)],
        "u string",
    )
    hosts = [r.h for r in df.select(U.url_host(F.col("u")).alias("h")).collect()]
    assert hosts == ["[2001:db8::1]", "[::1]", "[2001:db8::1]"]


def _mini_psl(spark):
    return spark.createDataFrame(
        [(s,) for s in [
            "com", "org", "net", "uk", "co.uk", "ac.uk", "jp", "nagoya.jp",
            "us", "k12.ma.us", "pvt.k12.ma.us", "io", "github.io", "de",
            "fr", "gouv.fr", "au", "com.au", "edu.au", "br",
        ]],
        "suffix string",
    )


def test_psl_longest_match_and_heuristic_fallback(spark):
    hosts = [
        "www.example.com",      # agrees with heuristic
        "news.site.co.uk",      # agrees (allowlist covers co.uk)
        "foo.nagoya.jp",        # DIVERGES: PSL suffix nagoya.jp not in allowlist
        "a.b.pvt.k12.ma.us",    # DIVERGES: 4-label suffix, heuristic can't see it
        "user.github.io",       # DIVERGES: github.io is a private-section suffix
        "site.gouv.fr",         # DIVERGES: gouv.fr multi-part ccTLD
        "x.example.de",         # agrees
        "localhost",            # atomic → fallback → itself
        "192.168.0.3",          # atomic → fallback → itself
        "unknown.tld.zz",       # no PSL match at all → heuristic fallback
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = U.registrable_domain_psl(df, "host", _mini_psl(spark))
    got = {r.host: r.domain for r in out.collect()}
    assert got["www.example.com"] == "example.com"
    assert got["news.site.co.uk"] == "site.co.uk"
    assert got["foo.nagoya.jp"] == "foo.nagoya.jp"
    assert got["a.b.pvt.k12.ma.us"] == "b.pvt.k12.ma.us"
    assert got["user.github.io"] == "user.github.io"
    assert got["site.gouv.fr"] == "site.gouv.fr"
    assert got["x.example.de"] == "example.de"
    assert got["localhost"] == "localhost"
    assert got["192.168.0.3"] == "192.168.0.3"
    assert got["unknown.tld.zz"] == "tld.zz"
    # divergence from the heuristic ONLY on the documented cases
    heur = {
        r.host: r.d
        for r in df.select(
            "host", U.registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    diverged = {h for h in hosts if got[h] != heur[h]}
    assert diverged == {
        "foo.nagoya.jp", "a.b.pvt.k12.ma.us", "user.github.io", "site.gouv.fr"
    }


def test_psl_row_count_preserved(spark):
    # chained left joins must never duplicate or drop corpus rows, even
    # with duplicate suffixes in the PSL table
    psl = _mini_psl(spark).unionAll(_mini_psl(spark))  # dup every suffix
    df = spark.createDataFrame(
        [(f"h{i}.sub.example.com",) for i in range(50)] + [("bare.com",)],
        "host string",
    )
    out = U.registrable_domain_psl(df, "host", psl)
    assert out.count() == 51
    assert out.filter(F.col("domain") == "example.com").count() == 50


def test_canonicalize_property_batch(spark):
    """Batch property sweep over a seeded cross-product of URL shapes
    (schemes × hosts incl. atomic × ports × paths × queries × fragments):
    canonicalization is idempotent on every combination, and the
    registrable domain is always a trailing piece of (or equal to) the
    host. One Spark pass for the whole matrix, not one per example."""
    import random

    rng = random.Random(7)
    schemes = ["http", "HTTPS", "ftp"]
    hosts = [
        "WWW.Example.COM", "a.b.site.co.uk", "localhost", "192.168.0.3",
        "[2001:DB8::1]", "x.org", "deep.sub.domain.nagoya.jp",
    ]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a/b/", "/x//", "/p"]
    queries = ["", "?utm_source=x", "?b=2&a=1", "?z=1&utm_campaign=c&y=2&gclid=0"]
    frags = ["", "#sec"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    c1 = U.canonicalize_url(F.col("u"))
    out = df.select(
        "u",
        c1.alias("c1"),
        U.canonicalize_url(c1).alias("c2"),
        U.url_host(F.col("u")).alias("host"),
    )
    out = out.withColumn("dom", U.registrable_domain(F.col("host")))
    bad_idem = out.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad_idem, f"non-idempotent: {bad_idem[:5]}"
    bad_dom = out.filter(
        (F.col("dom") != F.col("host"))
        & ~F.col("host").endswith(F.concat(F.lit("."), F.col("dom")))
    ).collect()
    assert not bad_dom, f"domain not a host suffix: {bad_dom[:5]}"


def test_leakage_safe_split_same_canon_same_split(spark):
    """Raw variants that canonicalize identically must land in the SAME
    train/val/test split — the no-leakage property comes from hashing
    the canonical form, never the raw string or the doc id."""
    variants = [
        "HTTP://Ex.COM:80/a/b/?utm_source=1&b=2#f",
        "http://ex.com/a/b?b=2",
        "http://EX.com/a/b/?b=2&gclid=7",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "u string")
    canon = U.canonicalize_url(F.col("u"))
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    split = (
        F.when(h % 100 < 98, F.lit("train"))
        .when(h % 100 < 99, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    rows = df.select(canon.alias("c"), split.alias("s")).collect()
    assert len({r.c for r in rows}) == 1  # truly the same canonical URL
    assert len({r.s for r in rows}) == 1  # → same split, no leakage


def test_param_sort_is_byte_order(spark):
    # uppercase params sort BEFORE lowercase (binary order) — matches
    # DuckDB's list_sort default, which the battery oracle relies on
    assert (
        _canon(spark, "http://ex.com/p?b=2&A=1&a=3&Z=0")
        == "http://ex.com/p?A=1&Z=0&a=3&b=2"
    )
