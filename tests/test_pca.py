"""Power-iteration PCA (operators/pca.py): agreement with a numpy
replay of the identical fixed loop, unit norm, and explained-variance
sanity."""

from __future__ import annotations

import math

import numpy as np

from reddit_tech_jobs_data_pipeline_spark.operators import pca
from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _np_power(X, iters):
    Xc = X - X.mean(axis=0)
    v = np.zeros(X.shape[1])
    v[0] = 1.0
    for _ in range(iters):
        w = Xc.T @ (Xc @ v)
        v = w / np.linalg.norm(w)
    num = float(((Xc @ v) ** 2).sum())
    den = float((Xc**2).sum())
    return v, num / den


def test_matches_numpy_replay_of_same_loop(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    v, ev = pca.top_component(emb, dim=64, iters=3)
    rows = emb.orderBy("vec_id").collect()
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    nv, nev = _np_power(X, 3)
    # same fixed arithmetic up to float reassociation across partitions
    assert np.allclose(np.array(v), nv, atol=1e-9)
    assert abs(ev - nev) < 1e-9
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-12  # unit norm
    assert 0.0 < ev < 1.0


def test_dominant_direction_found_on_anisotropic_data(spark):
    # data stretched 20x along a known axis: 3 rounds must lock onto it
    rng = [((i * 37) % 100) / 50.0 - 1.0 for i in range(200)]
    rows = []
    for i, t in enumerate(rng):
        vec = [0.05 * (((i * 61 + j * 13) % 100) / 50.0 - 1.0) for j in range(8)]
        vec[3] += 20.0 * t
        rows.append((i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v, ev = pca.top_component(df, dim=8, iters=3)
    assert abs(v[3]) > 0.99  # the stretched axis dominates the component
    assert ev > 0.95


def test_degenerate_corpus_no_nan(spark):
    # all vectors identical: centered matrix is 0 → w = 0 on round 1;
    # the guard keeps the init direction instead of dividing into NaN
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v, ev = pca.top_component(df, dim=4, iters=3)
    assert v == [1.0, 0.0, 0.0, 0.0]
    assert ev == 0.0
    assert all(x == x for x in v)  # no NaN
