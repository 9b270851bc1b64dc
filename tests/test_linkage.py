"""Fellegi-Sunter-style scored linkage (operators/linkage.py): weight
arithmetic, null-as-disagreement, and threshold exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import linkage


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "id_a long, id_b long, blk string, na string, nb string, xa long, xb long"
    )


def _comparisons(cand):
    return [
        (F.levenshtein("na", "nb") <= 1, 8, -4),
        (F.abs(F.col("xa") - F.col("xb")) <= 2, 3, -3),
    ]


def test_score_arithmetic(spark):
    cand = _pairs(
        spark,
        [
            (1, 2, "b", "abc", "abd", 10, 11),  # +8 +3 = 11
            (3, 4, "b", "abc", "zzz", 10, 11),  # -4 +3 = -1
            (5, 6, "b", "abc", "abd", 10, 99),  # +8 -3 = 5
        ],
    )
    score = linkage.linkage_score(_comparisons(cand))
    got = {r.id_a: r.s for r in cand.select("id_a", score.alias("s")).collect()}
    assert got == {1: 11, 3: -1, 5: 5}


def test_null_field_counts_as_disagreement(spark):
    cand = _pairs(spark, [(1, 2, "b", "abc", None, 10, 10)])
    score = linkage.linkage_score(_comparisons(cand))
    got = cand.select(score.alias("s")).collect()[0].s
    assert got == -4 + 3  # unknown name never supports the link


def test_blocked_link_threshold_and_blocking(spark):
    a = spark.createDataFrame(
        [(1, "b1", "abc", 10), (2, "b2", "abc", 10)],
        "id_a long, blk string, na string, xa long",
    )
    b = spark.createDataFrame(
        [(7, "b1", "abd", 11), (8, "b9", "abc", 10)],
        "id_b long, blk string, nb string, xb long",
    )
    out = linkage.blocked_link(a, b, ["blk"], _comparisons, threshold=11)
    rows = out.collect()
    # only (1,7) shares a block; it scores exactly 11 → kept at ≥ 11
    assert [(r.id_a, r.id_b, r.score) for r in rows] == [(1, 7, 11)]
    # threshold is integer-exact: 12 excludes the same pair
    assert linkage.blocked_link(a, b, ["blk"], _comparisons, threshold=12).count() == 0
