"""SemDeDup (operators/dedup.semantic_dedup): cluster-bounded embedding
near-dup pruning. Cross-engine equivalence is gated by the
`semantic_dedup_clusters` catalog oracle; here the SEMANTICS are pinned
on hand-built vectors where the expected keep/drop set is derivable by
eye: two well-separated direction groups, each with an exact-ish
duplicate, plus one same-cluster-but-dissimilar vector that must
survive."""

from __future__ import annotations

from reddit_tech_jobs_data_pipeline_spark.operators import dedup


def test_semantic_dedup_keeps_one_per_group(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),     # group A anchor (init centroid 1)
        (1, [0.0, 0.0, 1.0, 0.0]),     # group B anchor (init centroid 2)
        (2, [0.99, 0.02, 0.0, 0.0]),   # ~dup of 0 (cos ~ 1)
        (3, [0.6, 0.8, 0.0, 0.0]),     # cluster A but cos(0,3)=0.6 < 0.7 → kept
        (4, [0.0, 0.0, 0.98, 0.03]),   # ~dup of 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in dedup.semantic_dedup(
            emb, k=2, dim=4, train_iters=2, threshold=0.7
        ).collect()
    }
    assert out[0].is_kept and out[1].is_kept and out[3].is_kept
    assert not out[2].is_kept and out[2].first_dup == 0
    assert not out[4].is_kept and out[4].first_dup == 1
    # duplicates are confined to their cluster: 2 shares 0's cluster, 4 shares 1's
    assert out[2].cid == out[0].cid and out[4].cid == out[1].cid
    assert out[2].cid != out[4].cid
    assert out[0].n_sem_dups == 0 and out[2].n_sem_dups == 1


def test_semantic_dedup_no_pairs_all_kept(spark):
    # orthogonal vectors: nothing exceeds the threshold anywhere
    rows = [(i, [1.0 if j == i else 0.0 for j in range(4)]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dedup.semantic_dedup(emb, k=2, dim=4, train_iters=1, threshold=0.7)
    got = out.collect()
    assert len(got) == 4 and all(r.is_kept for r in got)
    assert all(r.n_sem_dups == 0 and r.first_dup is None for r in got)


def test_two_level_assignment_agrees_with_exact(spark):
    """The IVF-style two-level quantizer must reproduce the exact
    assignment on >= 95% of vectors at nprobe=3 (only coarse-cell
    boundary vectors may differ; nprobe is the recall dial — ~92% at
    nprobe=2 on this corpus), preserve the row count exactly, and emit
    the same schema."""
    from pyspark.sql import functions as F

    from reddit_tech_jobs_data_pipeline_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_two_level,
        lloyd_kmeans,
    )
    from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    cents = lloyd_kmeans(emb, k=16, dim=64, iterations=2).select("cid", "cvec")
    exact = {r.vec_id: r.cid for r in assign_clusters(vecs, cents).collect()}
    approx = {
        r.vec_id: r.cid
        for r in assign_clusters_two_level(
            vecs, cents, dim=64, nprobe=3
        ).collect()
    }
    assert set(approx) == set(exact)  # one row per vector, none lost
    agree = sum(1 for k in exact if exact[k] == approx[k]) / len(exact)
    assert agree >= 0.95, f"two-level agreement only {agree:.3f}"


def test_semantic_dedup_two_level_mode_runs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0, 0.0]),
        (2, [0.99, 0.02, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.98, 0.03]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in dedup.semantic_dedup(
            emb, k=2, dim=4, train_iters=2, threshold=0.7,
            two_level_assign=True, nprobe=2,
        ).collect()
    }
    # nprobe=2 of ncoarse=2 probes everything → identical to exact here
    assert out[0].is_kept and out[1].is_kept
    assert not out[2].is_kept and out[2].first_dup == 0
    assert not out[4].is_kept and out[4].first_dup == 1
