"""Production-mode curriculum ordering (operators/curriculum.py):
approx-decile assignment vs the exact global ntile, ordering
invariants, and the range-partitioned physical writer."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import curriculum


def _scored(spark, n=1000):
    # deterministic, collision-free scores with a non-uniform shape
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.sin(F.col("id").cast("double")) * 100 + F.col("id") * 1e-6).alias(
            "score"
        ),
    )


def test_approx_deciles_agree_with_exact_ntile(spark):
    docs = _scored(spark)
    approx = curriculum.curriculum_order_scale(docs, "score", relative_error=0.0001)
    exact = docs.select(
        "doc_id",
        F.ntile(10)
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .cast("long")
        .alias("decile_exact"),
    )
    j = approx.join(exact, "doc_id").select("decile", "decile_exact").collect()
    agree = sum(1 for r in j if r.decile == r.decile_exact)
    assert agree / len(j) >= 0.99
    # no doc may ever be off by more than one band
    assert all(abs(r.decile - r.decile_exact) <= 1 for r in j)


def test_decile_assignment_is_monotone_in_score(spark):
    docs = _scored(spark, 500)
    out = curriculum.curriculum_order_scale(docs, "score").collect()
    by_score = sorted(out, key=lambda r: -r.score)
    deciles = [r.decile for r in by_score]
    assert deciles == sorted(deciles)  # higher score → never a later decile
    assert deciles[0] == 1 and deciles[-1] == 10


def test_assignment_is_partitioning_invariant(spark):
    docs = _scored(spark, 300)
    a = curriculum.curriculum_order_scale(docs, "score")
    b = curriculum.curriculum_order_scale(docs.repartition(7), "score")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_null_scores_are_dropped(spark):
    docs = _scored(spark, 100).withColumn(
        "score", F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("score"))
    )
    out = curriculum.curriculum_order_scale(docs, "score")
    assert out.count() == 80
    assert out.filter(F.col("decile").isNull()).count() == 0


def test_writer_realizes_global_curriculum_order(spark, tmp_path):
    docs = _scored(spark, 800)
    ordered = curriculum.curriculum_order_scale(docs, "score")
    path = str(tmp_path / "curriculum")
    curriculum.write_curriculum_shards(ordered, path, num_shards=6)

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == 6
    # pyarrow reads preserve physical row order; concatenating files in
    # filename order must stream (decile, h, doc_id) non-decreasing —
    # i.e. best-quality deciles first, seeded order inside each
    keys = []
    for f in files:
        t = pq.read_table(f, columns=["decile", "h", "doc_id"])
        keys.extend(zip(*(t.column(c).to_pylist() for c in ("decile", "h", "doc_id"))))
    assert len(keys) == 800
    assert keys == sorted(keys)
    assert keys[0][0] == 1 and keys[-1][0] == 10


def test_nan_scores_land_in_worst_decile_and_do_not_shift_cuts(spark):
    # Regression: Spark orders NaN GREATER than every numeric, so the plain
    # when-chain put NaN in decile 1 (best band) — a doc with no valid
    # score would have trained FIRST in a quality curriculum.
    docs = _scored(spark, 200).withColumn(
        "score",
        F.when(F.col("doc_id") % 10 == 0, F.lit(float("nan"))).otherwise(
            F.col("score")
        ),
    )
    out = curriculum.curriculum_order_scale(docs, "score")
    nan_rows = out.filter(F.isnan("score")).collect()
    assert len(nan_rows) == 20
    assert all(r.decile == 10 for r in nan_rows)  # worst band, never best
    # cut points exclude NaN: they equal the cuts of the NaN-free subset
    clean = docs.filter(~F.isnan("score"))
    assert curriculum.approx_decile_cuts(docs, "score") == (
        curriculum.approx_decile_cuts(clean, "score")
    )
    # ascending mode: worst band is decile 1
    asc = curriculum.assign_curriculum_decile(
        F.col("score"), curriculum.approx_decile_cuts(docs, "score"), descending=False
    )
    asc_nan = docs.select("score", asc.alias("d")).filter(F.isnan("score")).collect()
    assert all(r.d == 1 for r in asc_nan)
