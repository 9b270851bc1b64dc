"""Distributed logistic regression: agreement with a pure-python GD,
convergence on a separable teacher task, and scoring determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import classifier


def _toy(spark, n=200):
    # two gaussian-ish blobs along f1; f2 is noise-ish but deterministic
    rows = []
    for i in range(n):
        y = i % 2
        f1 = (1.0 if y else -1.0) + ((i * 37) % 100) / 200.0
        f2 = ((i * 61) % 100) / 100.0 - 0.5
        rows.append((i, float(f1), float(f2), float(y)))
    return spark.createDataFrame(rows, "id long, f1 double, f2 double, label double")


def _py_gd(rows, lr, iters):
    # reference implementation: identical math, python floats
    w = [0.0, 0.0]
    b = 0.0
    n = len(rows)
    for _ in range(iters):
        g = [0.0, 0.0]
        gb = 0.0
        for f1, f2, y in rows:
            z = b + w[0] * f1 + w[1] * f2
            p = 1.0 / (1.0 + math.exp(-z))
            e = p - y
            g[0] += e * f1
            g[1] += e * f2
            gb += e
        w = [wi - lr * gi / n for wi, gi in zip(w, g)]
        b -= lr * gb / n
    return w, b


def test_spark_gd_matches_pure_python(spark):
    df = _toy(spark).cache()
    w, b = classifier.logreg_train(df, "label", feature_cols=("f1", "f2"), lr=1.0, iters=10)
    rows = [(r.f1, r.f2, r.label) for r in df.collect()]
    pw, pb = _py_gd(rows, 1.0, 10)
    # same arithmetic up to float summation order over 200 rows
    assert abs(b - pb) < 1e-9
    assert all(abs(a - c) < 1e-9 for a, c in zip(w, pw))
    df.unpersist()


def test_training_converges_and_loss_decreases(spark):
    df = _toy(spark).cache()
    l0 = classifier.log_loss(df, "label", [0.0, 0.0], 0.0, ("f1", "f2"))
    w, b = classifier.logreg_train(df, "label", feature_cols=("f1", "f2"), lr=2.0, iters=40)
    l1 = classifier.log_loss(df, "label", w, b, ("f1", "f2"))
    assert l1 < l0 / 2
    scored = classifier.logreg_score(df, w, b, ("f1", "f2"))
    acc = scored.agg(
        F.avg(((F.col("score") >= 0.5).cast("double") == F.col("label")).cast("double"))
    ).first()[0]
    assert acc >= 0.95
    assert w[0] > 0  # f1 is the separating feature, positive direction
    df.unpersist()


def test_standardize_features_zero_mean_unit_var(spark):
    df = _toy(spark)
    std = classifier.standardize_features(df, ("f1", "f2"))
    got = std.agg(
        F.avg("f1"), F.stddev_pop("f1"), F.avg("f2"), F.stddev_pop("f2")
    ).first()
    assert abs(got[0]) < 1e-9 and abs(got[1] - 1.0) < 1e-9
    assert abs(got[2]) < 1e-9 and abs(got[3] - 1.0) < 1e-9
    # constant column: centered, not divided by zero
    cst = df.withColumn("f3", F.lit(2.5))
    out = classifier.standardize_features(cst, ("f3",))
    vals = {r.f3 for r in out.collect()}
    assert vals == {0.0}


def test_empty_input_returns_zero_weights(spark):
    df = _toy(spark).filter(F.lit(False))
    w, b = classifier.logreg_train(df, "label", feature_cols=("f1", "f2"))
    assert w == [0.0, 0.0] and b == 0.0


def test_featurize_documents_values(spark):
    docs = spark.createDataFrame(
        [(1, "the fast fox the end")], "doc_id long, text string"
    )
    r = classifier.featurize_documents(docs).collect()[0]
    assert r.f_len == 5 / 100.0
    assert r.f_stop == 2 / 5.0  # 'the' twice
    assert r.f_distinct == 4 / 5.0
    # chars=20, separators=4 → mean word len (20-4)/5 = 3.2, /10
    assert abs(r.f_wlen - 0.32) < 1e-12
