"""DSIR importance-weighting semantics on a controlled corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import dsir


def _corpus(spark):
    # target speaks "alpha beta gamma", off-target raw speaks "xray
    # yankee zulu"; raw doc 10 mimics the target, raw doc 11 does not
    rows = [
        (1, "tgt", "alpha beta gamma alpha beta gamma alpha beta"),
        (2, "tgt", "beta gamma alpha beta gamma alpha beta gamma"),
        (10, "raw", "alpha beta gamma alpha beta gamma alpha beta"),
        (11, "raw", "xray yankee zulu xray yankee zulu xray yankee"),
        (12, "raw", "alpha beta xray yankee alpha beta xray yankee"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_target_like_raw_doc_scores_higher(spark):
    out = dsir.dsir_weights(_corpus(spark), F.col("source") == "tgt")
    got = {r.doc_id: r.logw_per_feat for r in out.collect()}
    assert set(got) == {10, 11, 12}  # target docs are never scored
    assert got[10] > got[12] > got[11]
    assert got[10] > 0 > got[11]  # signs split mimic vs anti-target


def test_short_and_null_docs_produce_no_rows(spark):
    rows = [
        (1, "tgt", "alpha beta gamma alpha"),
        (2, "raw", "solo"),
        (3, "raw", None),
        (4, "raw", "alpha beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = dsir.dsir_weights(df, F.col("source") == "tgt")
    got = {r.doc_id: r.n_feat for r in out.collect()}
    assert got == {4: 1}  # one bigram; docs 2 (1 token) and 3 (null) drop
