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


def test_histogram_additive_across_disjoint_batches(spark, tmp_path):
    docs = _corpus(spark)
    is_t = F.col("source") == "tgt"
    full = dsir.dsir_histogram(docs, is_t)
    # three-way split by doc_id residue, batch 0 through a parquet store
    parts = [docs.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    h0 = dsir.dsir_histogram(parts[0], is_t)
    store = str(tmp_path / "hist_store")
    h0.write.parquet(store)
    merged = dsir.merge_dsir_histograms(
        spark.read.parquet(store),
        dsir.dsir_histogram(parts[1], is_t),
        dsir.dsir_histogram(parts[2], is_t),
    )
    key = lambda r: (r.bk, r.cp, r.cq)
    assert sorted(map(key, merged.collect())) == sorted(map(key, full.collect()))


def test_incremental_model_scores_equal_oneshot(spark):
    docs = _corpus(spark)
    is_t = F.col("source") == "tgt"
    oneshot = dsir.dsir_weights(docs, is_t)
    merged = dsir.merge_dsir_histograms(
        dsir.dsir_histogram(docs.filter(F.col("doc_id") < 10), is_t),
        dsir.dsir_histogram(docs.filter(F.col("doc_id") >= 10), is_t),
    )
    inc = dsir.dsir_score(docs.filter(~is_t), dsir.dsir_model(merged))
    key = lambda r: (r.doc_id, r.n_feat, r.logw_per_feat)
    assert sorted(map(key, inc.collect())) == sorted(map(key, oneshot.collect()))
