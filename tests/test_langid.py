"""Trained char-trigram language ID on corpora where the answer is known
(the catalog's synthetic docs are language-independent by construction,
so real discrimination is pinned here instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import langid


def _bilingual(spark):
    en = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she sells sea shells by the sea shore every single morning",
        "a stitch in time saves nine and the early bird catches the worm",
    ]
    zz = [
        "zzq qzz xqz zqx qqz zxq zzx qxz zqq xzz qzx zxz qqx zzz",
        "xq zz qx zq xz qq zx qz xx zzq qzz xqz zqx qqz",
        "qzx zxz qqx zzz xzz zqq qxz zzx zxq qqz zqx xqz qzz zzq",
    ]
    rows = [(i, "en", t) for i, t in enumerate(en)]
    rows += [(10 + i, "zz", t) for i, t in enumerate(zz)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_profiles_discriminate_real_languages(spark):
    docs = _bilingual(spark)
    prof = langid.ngram_profiles(docs, "lang", "text", top_k=50)
    out = langid.langid_classify(
        docs, prof, "text", "doc_id", top_k=50, carry_cols=("lang",)
    )
    got = {r.doc_id: (r.lang, r.pred_lang) for r in out.collect()}
    assert len(got) == 6
    assert all(true == pred for true, pred in got.values())


def test_unseen_doc_classified_against_trained_profiles(spark):
    docs = _bilingual(spark)
    prof = langid.ngram_profiles(docs, "lang", "text", top_k=50)
    new = spark.createDataFrame(
        [
            (100, "the brown dog sleeps near the shore in the morning"),
            (101, "zz qq xq zqx zzq qzz zxz"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pred_lang for r in
           langid.langid_classify(new, prof, "text", "doc_id", top_k=50).collect()}
    assert out == {100: "en", 101: "zz"}


def test_short_and_null_docs_produce_no_rows(spark):
    docs = _bilingual(spark)
    prof = langid.ngram_profiles(docs, "lang", "text")
    new = spark.createDataFrame(
        [(1, "ab"), (2, None), (3, "   "), (4, "the sea")],
        "doc_id long, text string",
    )
    out = langid.langid_classify(new, prof, "text", "doc_id")
    assert [r.doc_id for r in out.collect()] == [4]


def test_tie_breaks_to_lowest_language_code(spark):
    # two languages trained on IDENTICAL text -> identical profiles ->
    # equal distances; the argmin must deterministically pick 'aa'
    rows = [(1, "bb", "same words every time"), (2, "aa", "same words every time")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    prof = langid.ngram_profiles(docs, "lang", "text")
    new = spark.createDataFrame([(9, "same words every time")], "doc_id long, text string")
    out = langid.langid_classify(new, prof, "text", "doc_id").collect()
    assert out[0].pred_lang == "aa"


def test_gram_counts_additive_for_incremental_profiles(spark):
    # ngram_profiles ranks a (lang, gram) count table; the counts are
    # additive across disjoint batches exactly like DSIR's histograms,
    # so incremental profile maintenance = per-batch counts + merge +
    # re-rank. Pinned here at the property level (the catalog's
    # dsir_incremental_model oracle-proves the shared pattern e2e).
    docs = _bilingual(spark)
    full = (
        langid.char_ngrams(docs, "text", carry_cols=("lang",))
        .groupBy("lang", "gram")
        .count()
    )
    parts = [
        langid.char_ngrams(
            docs.filter(F.col("doc_id") % 2 == r), "text", carry_cols=("lang",)
        )
        .groupBy("lang", "gram")
        .count()
        for r in range(2)
    ]
    merged = (
        parts[0].unionByName(parts[1]).groupBy("lang", "gram")
        .agg(F.sum("count").alias("count"))
    )
    key = lambda r: (r.lang, r.gram, r["count"])
    assert sorted(map(key, merged.collect())) == sorted(map(key, full.collect()))
