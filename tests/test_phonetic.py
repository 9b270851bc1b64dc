"""The portable-SQL Soundex used by phonetic_blocking_pairs' oracle must
be bit-identical to Spark's native soundex() — fuzzed beyond the fixture
vocabulary so an engine upgrade changing edge-case behavior is caught."""

from __future__ import annotations

import itertools

import duckdb
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog_behavior import _soundex_sql


def _duck_soundex(words):
    con = duckdb.connect()
    con.execute("CREATE TABLE words AS SELECT unnest(?) AS w", [list(words)])
    return dict(
        con.execute(f"SELECT w, {_soundex_sql('w')} AS s FROM words").fetchall()
    )


def test_sql_soundex_matches_spark_on_fuzz_set(spark):
    # h/w transparency, leading h/w, vowel separators, long digit runs
    alpha = "abchlmrswxz"
    words = ["".join(c) for c in itertools.product(alpha, repeat=3)]
    words += ["".join(c) for c in itertools.product("bhwl", repeat=4)]
    words += ["anvil", "widget", "small", "gizmo", "plate", "hw", "wh", "a"]
    smap = {
        r.w: r.s
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.soundex("w").alias("s"))
        .collect()
    }
    dmap = _duck_soundex(words)
    bad = {w: (smap[w], dmap[w]) for w in words if smap[w] != dmap[w]}
    assert not bad, dict(list(bad.items())[:10])


def test_phonetic_blocking_finds_same_noun_pairs(spark):
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry

    rows = (
        get_registry()["phonetic_blocking_pairs"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        # blocked pairs share the noun's soundex, hence (here) the noun
        assert r.name_a.split()[1] == r.name_b.split()[1]
        assert 1 <= r.lev <= 6
