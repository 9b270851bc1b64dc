"""The 100 TB skew guards, exercised on purpose-built skewed fixtures.

Two load-bearing claims get measured here instead of just documented:

* ``dedup.ngram_jaccard_pairs(max_df=...)`` — a stop-shingle present in
  EVERY document makes the inverted-index self-join quadratic (every
  doc meets every doc). The guard drops shingles with document
  frequency > max_df before the join, bounding candidates.

* ``graph.cooccurrence_edges(max_group_size=...)`` — one hot group with
  m members contributes m·(m-1)/2 pairs from a single task. The guard
  drops groups larger than the cap before the explode.

Measured candidate counts are recorded in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
from reddit_tech_jobs_data_pipeline_spark.operators.graph import cooccurrence_edges

N_DOCS = 60


def _skewed_corpus(spark):
    # every doc: 3 unique tokens then one shared trigram → each doc has
    # 4 distinct 3-shingles, exactly one ("common shingle here") shared
    # by ALL docs; no other cross-doc shingle exists
    rows = [(i, f"u{i} v{i} w{i} common shingle here") for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "id long, text string")


def test_stop_shingle_guard_bounds_jaccard_candidates(spark):
    docs = _skewed_corpus(spark)
    # threshold=0 keeps every candidate pair → the output IS the
    # candidate set, so its count measures join blow-up directly
    unguarded = ngram_jaccard_pairs(docs, "text", "id", n=3, threshold=0.0)
    assert unguarded.count() == N_DOCS * (N_DOCS - 1) // 2  # all-pairs: 1770
    guarded = ngram_jaccard_pairs(
        docs, "text", "id", n=3, threshold=0.0, max_df=10
    )
    # the universal shingle (df=60 > 10) is dropped; no other shingle is
    # shared, so zero candidates remain
    assert guarded.count() == 0


def test_stop_shingle_guard_keeps_true_positives(spark):
    # two genuinely near-duplicate docs + the universal stop-shingle:
    # the guard must drop the stop-shingle without losing the real pair
    rows = [(i, f"u{i} v{i} w{i} common shingle here") for i in range(N_DOCS)]
    rows.append((1000, "alpha beta gamma delta epsilon zeta"))
    rows.append((1001, "alpha beta gamma delta epsilon eta"))
    docs = spark.createDataFrame(rows, "id long, text string")
    guarded = ngram_jaccard_pairs(
        docs, "text", "id", n=3, threshold=0.5, max_df=10
    )
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert got == {(1000, 1001)}


def test_hot_group_guard_bounds_cooccurrence_edges(spark):
    # part 1: 100 suppliers (hot); parts 2..41: 2 suppliers each (cold)
    rows = [(1, s) for s in range(1000, 1100)]
    rows += [(p, p * 10) for p in range(2, 42)]
    rows += [(p, p * 10 + 1) for p in range(2, 42)]
    df = spark.createDataFrame(rows, "part long, supp long")
    unguarded = cooccurrence_edges(df, "part", "supp")
    # hot group: C(100,2)=4950 half-edges; cold: 40 pairs — both mirrored
    assert unguarded.count() == 2 * (4950 + 40)
    guarded = cooccurrence_edges(df, "part", "supp", max_group_size=20)
    assert guarded.count() == 2 * 40
    # the cold edges themselves are unchanged by the guard
    cold = {
        (r["src"], r["dst"])
        for r in guarded.filter(F.col("src") < F.col("dst")).collect()
    }
    assert cold == {(p * 10, p * 10 + 1) for p in range(2, 42)}
