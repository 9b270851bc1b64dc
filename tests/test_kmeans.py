"""Lloyd k-means operator: hand-checkable assignments, stability on a
converged configuration, empty-cluster drop-out."""

from __future__ import annotations

from reddit_tech_jobs_data_pipeline_spark.operators.kmeans import lloyd_kmeans

# two tight groups far apart in 2-D; ids 1,2 seed the two centroids
PTS = [
    (1, [0.0, 0.0]),
    (2, [10.0, 10.0]),
    (3, [0.5, 0.0]),
    (4, [0.0, 0.5]),
    (5, [10.5, 10.0]),
    (6, [10.0, 10.5]),
]


def _df(spark):
    return spark.createDataFrame(PTS, "vec_id long, embedding array<double>")


class TestTrainedIvf:
    def test_query_finds_own_cluster(self, spark):
        from reddit_tech_jobs_data_pipeline_spark.operators.similarity import (
            ivf_trained_ann_topk,
        )

        # two angular clusters (no zero vectors — cosine is undefined there)
        pts = [
            (1, [1.0, 0.1]),
            (2, [0.1, 1.0]),
            (3, [1.0, 0.2]),
            (4, [0.9, 0.1]),
            (5, [0.1, 0.9]),
            (6, [0.2, 1.0]),
        ]
        corpus = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        queries = corpus.filter("vec_id = 3")  # x-axis cluster
        out = ivf_trained_ann_topk(
            corpus, queries, k=2, num_cells=2, nprobe=1, train_iters=2, dim=2
        ).collect()
        assert {r.neighbor_id for r in out} == {1, 4}


class TestLloydKmeans:
    def test_two_well_separated_clusters(self, spark):
        out = lloyd_kmeans(_df(spark), k=2, dim=2, iterations=2).collect()
        by_cid = {r.cid: r for r in out}
        assert set(by_cid) == {0, 1}
        # cluster 0 seeded at (0,0) gathers ids {1,3,4}; cluster 1 the rest
        assert by_cid[0].n == 3 and by_cid[0].vid_sum == 1 + 3 + 4
        assert by_cid[1].n == 3 and by_cid[1].vid_sum == 2 + 5 + 6
        # centroid of {(0,0),(0.5,0),(0,0.5)} = (1/6, 1/6)
        assert [round(v, 6) for v in by_cid[0].cvec] == [round(1 / 6, 6)] * 2

    def test_converged_config_is_fixed_point(self, spark):
        one = lloyd_kmeans(_df(spark), k=2, dim=2, iterations=2).collect()
        three = lloyd_kmeans(_df(spark), k=2, dim=2, iterations=3).collect()
        assert sorted((r.cid, r.n, r.vid_sum) for r in one) == sorted(
            (r.cid, r.n, r.vid_sum) for r in three
        )

    def test_deep_run_checkpoint_path_matches_shallow(self, spark):
        """iterations=9 crosses the every-4-iterations localCheckpoint
        twice; on a converged configuration the result must be identical
        to the un-checkpointed 2-iteration run (checkpointing may never
        change values)."""
        shallow = lloyd_kmeans(_df(spark), k=2, dim=2, iterations=2).collect()
        deep = lloyd_kmeans(_df(spark), k=2, dim=2, iterations=9).collect()
        assert sorted((r.cid, r.n, r.vid_sum, tuple(r.cvec)) for r in shallow) == sorted(
            (r.cid, r.n, r.vid_sum, tuple(r.cvec)) for r in deep
        )

    def test_commutative_scale_update_matches_ordered_fold(self, spark):
        """The posexplode/map-side-sum scale update must agree with the
        ordered fold up to float reassociation noise on an irregular
        point set."""
        pts = [
            (i, [((i * 7) % 13) / 3.0, ((i * 5) % 11) / 7.0, ((i * 3) % 17) / 5.0])
            for i in range(1, 30)
        ]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        a = {r.cid: r for r in lloyd_kmeans(df, k=4, dim=3, iterations=3).collect()}
        b = {
            r.cid: r
            for r in lloyd_kmeans(
                df, k=4, dim=3, iterations=3, commutative=True
            ).collect()
        }
        assert set(a) == set(b)
        for cid, ra in a.items():
            rb = b[cid]
            assert (ra.n, ra.vid_sum) == (rb.n, rb.vid_sum)
            for x, y in zip(ra.cvec, rb.cvec):
                assert abs(x - y) <= 1e-12 * max(1.0, abs(x))

    def test_empty_cluster_drops_out(self, spark):
        # k = n: every point is its own centroid; with a duplicate point,
        # one centroid captures both copies and one cluster goes empty
        pts = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [5.0, 5.0])]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        out = lloyd_kmeans(df, k=3, dim=2, iterations=2).collect()
        assert len(out) == 2  # the orphaned duplicate centroid vanished
        assert sorted(r.n for r in out) == [1, 2]
