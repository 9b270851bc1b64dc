"""int8 scalar quantization + quantized ANN (operators/similarity.py):
code round-trip invariants, degenerate dims, and recall@k against the
exact float path on real testdata."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import similarity
from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_codes_in_range_and_monotone(spark):
    df = _vec_df(spark, [[0.0, -1.0], [0.25, 0.0], [0.5, 1.0], [1.0, 3.0]])
    mn, mx = similarity.quantization_stats(df)
    assert mn == [0.0, -1.0] and mx == [1.0, 3.0]
    codes = [
        r.c
        for r in df.select(
            similarity.quantize_codes(F.col("embedding"), mn, mx).alias("c")
        )
        .orderBy("vec_id")
        .collect()
    ]
    flat0 = [c[0] for c in codes]
    assert flat0 == sorted(flat0)  # monotone in the input
    assert all(0 <= q <= 255 for c in codes for q in c)
    assert flat0[0] == 0 and flat0[-1] == 255  # extremes hit the rails


def test_dequantize_error_bounded_by_half_cell(spark):
    vals = [[-2.0 + 0.37 * i] for i in range(12)]
    df = _vec_df(spark, vals)
    mn, mx = similarity.quantization_stats(df)
    cell = (mx[0] - mn[0]) / 256
    rows = (
        df.select(
            "vec_id",
            F.element_at("embedding", 1).cast("double").alias("x"),
            F.element_at(
                similarity.dequantize(
                    similarity.quantize_codes(F.col("embedding"), mn, mx), mn, mx
                ),
                1,
            ).alias("dx"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.x - r.dx) <= cell / 2 + 1e-12


def test_degenerate_dim_reconstructs_exactly(spark):
    df = _vec_df(spark, [[1.5, 0.0], [1.5, 1.0], [1.5, 2.0]])
    mn, mx = similarity.quantization_stats(df)
    assert mn[0] == mx[0] == 1.5
    rows = df.select(
        similarity.dequantize(
            similarity.quantize_codes(F.col("embedding"), mn, mx), mn, mx
        ).alias("d")
    ).collect()
    assert all(r.d[0] == 1.5 for r in rows)


def test_recall_vs_exact_on_testdata(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, queries, k=5).collect()
    quant = similarity.quantized_topk(emb, queries, k=5).collect()
    want = {(r.query_id, r.neighbor_id) for r in exact}
    got = {(r.query_id, r.neighbor_id) for r in quant}
    recall = len(want & got) / len(want)
    # 64-dim int8 midpoint reconstruction: cosine error ~1e-3 — recall@5
    # stays high; the bound is intentionally loose to stay seed-robust
    assert recall >= 0.8, f"recall@5 {recall}"
    # and the quantized scores themselves are close to the exact ones
    exact_by_pair = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in quant:
        key = (r.query_id, r.neighbor_id)
        if key in exact_by_pair:
            assert abs(r.cosine - exact_by_pair[key]) < 0.02


def test_rank_contract_matches_brute_force_shape(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = similarity.quantized_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        ordered = sorted(rs, key=lambda r: (-r.cosine, r.neighbor_id))
        assert [r.rank for r in ordered] == [1, 2, 3, 4, 5]
        assert all(not math.isnan(r.cosine) for r in rs)


def test_label_centroid_outliers_flags_planted(spark):
    import random

    rng = random.Random(4)
    rows = []
    # two tight clusters around orthogonal axes + one planted mislabel
    for i in range(20):
        rows.append((i, [1.0 + rng.gauss(0, 0.05), rng.gauss(0, 0.05)], 0))
    for i in range(20, 40):
        rows.append((i, [rng.gauss(0, 0.05), 1.0 + rng.gauss(0, 0.05)], 1))
    rows.append((99, [0.0, 1.0], 0))  # label-0 vector sitting on cluster 1
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in rows],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.id: r for r in similarity.label_centroid_outliers(df).collect()}
    assert len(out) == 41
    assert out[99].is_outlier, out[99]
    assert out[99].z < -2
    # the planted point is the worst row of its label
    z0 = [r.z for r in out.values() if r.label == 0]
    assert out[99].z == min(z0)
    # clean rows: at most the natural z≤−2 tail gets flagged (~2.5%;
    # allow 2/20), never the bulk
    flagged_clean = sum(out[i].is_outlier for i in range(20, 40))
    assert flagged_clean <= 2, flagged_clean
