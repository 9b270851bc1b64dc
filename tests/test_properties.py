"""Property-based differential tests (SURVEY.md §5.3).

Each property generates a corpus with Hypothesis, runs the engine's native
column expressions, and compares against a pure-Python reimplementation of
the reference's row-wise semantics (dags/dag.py) — the strongest form of
the parity claim.

Generation is restricted to printable ASCII: Python ``re`` treats \\w/\\s
as Unicode classes while Java regex defaults to ASCII, so non-ASCII titles
are a known (documented) divergence surface, not a target.

Examples are vectorized — one DataFrame per Hypothesis example — to keep
Spark job counts sane.
"""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import given, settings, strategies as st

from reddit_tech_jobs_data_pipeline_spark.functions import extract, vocab
from reddit_tech_jobs_data_pipeline_spark.operators import merge as merge_ops
from reddit_tech_jobs_data_pipeline_spark import pipeline

SETTINGS = settings(max_examples=8, deadline=None)

# ---------------------------------------------------------------------------
# pure-Python reference semantics (mirrors dags/dag.py:17-39,41-69,132-140)
# ---------------------------------------------------------------------------

def py_salary(title):
    if not title:
        return (None, None, None)
    m = re.search(vocab.SALARY_PATTERN, title.lower(), re.IGNORECASE)
    if not m:
        return (None, None, None)
    return (m.group(1).strip() or "None", float(m.group(2)) * 1000, float(m.group(3)) * 1000)


def py_is_job_post(title):
    if not title:
        return False
    tl = title.lower()
    if any(k in tl for k in vocab.NEGATIVE_JOB_KEYWORDS):
        return False
    return any(k in tl for k in vocab.POSITIVE_JOB_KEYWORDS)


def py_technologies(title):
    if not title:
        return []
    words = set(re.findall(r"\b\w+\b", title.lower(), re.ASCII))
    return sorted(words.intersection(vocab.TECH_KEYWORDS))


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

_WORDS = (
    vocab.POSITIVE_JOB_KEYWORDS
    + vocab.NEGATIVE_JOB_KEYWORDS[:7]
    + list(vocab.TECH_KEYWORDS)
    + ["senior", "data", "engineer", "remote", "the", "a", "x9", "_u"]
)

word = st.sampled_from(_WORDS)
salary_frag = st.builds(
    lambda cur, lo, hi, sp: f"{cur}{lo}k {sp} {hi}k".replace(" - ", "-", 0) if sp else f"{cur}{lo}k-{hi}k",
    st.sampled_from(["$", "€", "usd ", "", "gbp"]),
    st.integers(10, 400),
    st.integers(10, 999),
    st.sampled_from(["-", "- ", " -", ""]),
)
noise = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12
)
title_strategy = st.lists(
    st.one_of(word, salary_frag, noise), min_size=0, max_size=8
).map(lambda parts: " ".join(parts))
titles_strategy = st.lists(st.one_of(title_strategy, st.none()), min_size=1, max_size=60)


def _run(spark, titles, cols):
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    return df.select(*cols).collect()


# ---------------------------------------------------------------------------
# properties
# ---------------------------------------------------------------------------

@SETTINGS
@given(titles=titles_strategy)
def test_salary_differential(spark, titles):
    rows = _run(
        spark,
        titles,
        [
            extract.salary_currency("title").alias("c"),
            extract.salary_bound("title", "lower").alias("lo"),
            extract.salary_bound("title", "upper").alias("hi"),
        ],
    )
    for t, r in zip(titles, rows):
        assert (r.c, r.lo, r.hi) == py_salary(t), repr(t)


@SETTINGS
@given(titles=titles_strategy)
def test_is_job_post_differential(spark, titles):
    rows = _run(spark, titles, [extract.is_job_post("title").alias("v")])
    for t, r in zip(titles, rows):
        assert r.v == py_is_job_post(t), repr(t)


@SETTINGS
@given(titles=titles_strategy)
def test_technologies_differential(spark, titles):
    rows = _run(spark, titles, [extract.technologies("title").alias("v")])
    for t, r in zip(titles, rows):
        assert r.v == py_technologies(t), repr(t)


@SETTINGS
@given(
    updates=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=20,
    )
)
def test_merge_idempotent_and_lww(spark, updates):
    old = spark.createDataFrame(
        [(k, 0, -1.0) for k in range(6)], "k int, version int, v double"
    )
    new = spark.createDataFrame(updates, "k int, version int, v double")
    once = merge_ops.merge_upsert(old, new, ["k"], "version", tiebreakers=["v"])
    twice = merge_ops.merge_upsert(once, new, ["k"], "version", tiebreakers=["v"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    # survivor per key = max (version, is_new, v): since old has version 0 &
    # new versions >= 0, any update for k beats old
    keys_updated = {u[0] for u in updates}
    for k, version, v in a:
        if k in keys_updated:
            assert version >= 0 and v >= 0.0
        else:
            assert version == 0 and v == -1.0


@SETTINGS
@given(
    days=st.lists(st.integers(0, 29), min_size=1, max_size=30),
    extra=st.integers(0, 120),
)
def test_watermark_monotone(spark, days, extra):
    # Monotonicity holds in the data-derived regime (some row within the
    # lookback). The 7-day cold-start fallback (dag.py:163-168) is NOT
    # monotone by design: an empty sink yields now-7d, which can exceed
    # genuinely old data added later — faithful reference behavior.
    now = dt.datetime(2024, 6, 1)
    base = [(now - dt.timedelta(days=d),) for d in days]
    sink = spark.createDataFrame(base, "ts timestamp")
    wm1 = merge_ops.watermark_lower_bound(sink, "ts", now=now)
    sink2 = spark.createDataFrame(base + [(now - dt.timedelta(days=extra),)], "ts timestamp")
    wm2 = merge_ops.watermark_lower_bound(sink2, "ts", now=now)
    assert wm2 >= wm1  # adding data never regresses a data-derived watermark


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(["a", "b"]), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_first_seen_survivor(spark, rows):
    df = spark.createDataFrame(rows, "post_id int, title string, scrape_seq int")
    out = pipeline.dedup_first_seen(df, ["post_id", "title"], "scrape_seq")
    got = {(r.post_id, r.title): r.scrape_seq for r in out.collect()}
    expect = {}
    for pid, t, seq in rows:
        if (pid, t) not in expect or seq < expect[(pid, t)]:
            expect[(pid, t)] = seq
    assert got == expect


def py_tokens(text):
    if text is None:
        return []
    return [t for t in re.split(r"\W+", text.lower(), flags=re.ASCII) if t != ""]


@SETTINGS
@given(titles=titles_strategy)
def test_tokens_differential(spark, titles):
    from reddit_tech_jobs_data_pipeline_spark.functions.extract import tokens

    rows = _run(spark, titles, [tokens("title").alias("v")])
    for t, r in zip(titles, rows):
        expected = py_tokens(t) if t is not None else None
        assert r.v == expected, repr(t)


@SETTINGS
@given(titles=titles_strategy)
def test_rolling_fingerprint_differential(spark, titles):
    import hashlib

    from reddit_tech_jobs_data_pipeline_spark.functions.text import rolling_fingerprint

    def py_rolling(text):
        if text is None:
            return None
        acc = 0
        for t in py_tokens(text):
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            acc = (acc * 31 + h) % 1_000_000_007
        return acc

    rows = _run(spark, titles, [rolling_fingerprint("title").alias("v")])
    for t, r in zip(titles, rows):
        assert r.v == py_rolling(t), repr(t)
